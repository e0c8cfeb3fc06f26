"""Serving subsystem: paged KV pool + continuous-batching engine."""

from .engine import PageAllocator, Request, ServingEngine

__all__ = ["PageAllocator", "Request", "ServingEngine"]
