"""Model integration layer: SEA attention core + student/teacher models."""

from .attention import SeaAttention, SeaAttentionOutput
from .bert import BertConfig, BertForSequenceClassification, BertModel, bert_base
from .opt import (
    OptConfig,
    OptForCausalLM,
    OptModel,
    opt_125m,
    opt_350m,
    stack_layer_params,
    unstack_layer_params,
)
from .state import SeaDecodeState, init_decode_state

__all__ = [
    "SeaAttention",
    "SeaAttentionOutput",
    "BertConfig",
    "BertForSequenceClassification",
    "BertModel",
    "bert_base",
    "OptConfig",
    "OptForCausalLM",
    "OptModel",
    "opt_125m",
    "opt_350m",
    "stack_layer_params",
    "unstack_layer_params",
    "SeaDecodeState",
    "init_decode_state",
]
