"""Model integration layer: SEA attention core + student/teacher models."""

from .attention import SeaAttention, SeaAttentionOutput
from .bert import (
    BertConfig,
    BertForMaskedLM,
    BertForMultipleChoice,
    BertForQuestionAnswering,
    BertForSequenceClassification,
    BertForTokenClassification,
    BertModel,
    bert_base,
)
from .opt import (
    OptConfig,
    OptForCausalLM,
    OptModel,
    opt_125m,
    opt_350m,
    stack_layer_params,
    unstack_layer_params,
)
from .llama import (
    LlamaConfig,
    LlamaForCausalLM,
    LlamaModel,
    llama_7b,
    llama_13b,
    llama_tiny,
)
from .state import SeaDecodeState, init_decode_state

__all__ = [
    "LlamaConfig",
    "LlamaForCausalLM",
    "LlamaModel",
    "llama_7b",
    "llama_13b",
    "llama_tiny",
    "SeaAttention",
    "SeaAttentionOutput",
    "BertConfig",
    "BertForMaskedLM",
    "BertForMultipleChoice",
    "BertForQuestionAnswering",
    "BertForSequenceClassification",
    "BertForTokenClassification",
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
