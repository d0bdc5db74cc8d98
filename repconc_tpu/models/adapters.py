"""Custom-model adapters: the non-builtin model/tokenizer API.

The reference demonstrates extending RepCONC to models outside the built-in
zoo via (a) a custom encoder class and (b) a custom tokenizer implementing
the `input_text_type` protocol (examples/ance/modeling_ance.py,
examples/tct-colbert/modeling_tct.py). In this framework custom ENCODER
architecture variants are EncoderConfig data (projection head, pooling mode —
see models/transformer.py), so an adapter only needs to supply its tokenizer
behavior. Both reference adapters are provided:

* ANCE: lower-cases all text before tokenization (modeling_ance.py:46-54).
* TCT-ColBERT: '[CLS] [Q] ' + query padded with [MASK] to length 36 /
  '[CLS] [D] ' + doc, add_special_tokens=False (modeling_tct.py:49-58).

Register new adapters with @register_adapter("name").
"""
from __future__ import annotations

from typing import Callable, Dict

_TOKENIZER_REGISTRY: Dict[str, Callable] = {}


def register_adapter(name: str):
    def deco(fn):
        _TOKENIZER_REGISTRY[name] = fn
        return fn
    return deco


def load_adapter_tokenizer(model_dir: str, adapter: str = None):
    """Load the tokenizer for `model_dir`, wrapped by the adapter protocol."""
    if adapter in _TOKENIZER_REGISTRY:
        return _TOKENIZER_REGISTRY[adapter](model_dir)
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_dir)


@register_adapter("ance")
def _ance_tokenizer(model_dir: str):
    from transformers import RobertaTokenizerFast

    class ANCETokenizerFast(RobertaTokenizerFast):
        """ANCE lower-cases text before tokenization (modeling_ance.py:46-54)."""

        def __call__(self, text, *args, **kwargs):
            assert isinstance(text, (list, tuple)), \
                f"ANCE tokenizer supports List[str] inputs, got {type(text)}"
            return super().__call__([t.lower() for t in text], *args, **kwargs)

    return ANCETokenizerFast.from_pretrained(model_dir)


@register_adapter("tct")
def _tct_tokenizer(model_dir: str):
    from transformers import BertTokenizerFast

    class TCTTokenizerFast(BertTokenizerFast):
        """TCT query/doc markers + fixed-36 query expansion
        (modeling_tct.py:49-58). Implements the input_text_type protocol."""

        def __call__(self, text, input_text_type, max_length=None,
                     add_special_tokens=False, **kwargs):
            if input_text_type == "query":
                max_length = 36
                text = ["[CLS] [Q] " + q + "[MASK]" * 36 for q in text]
            elif input_text_type == "doc":
                text = ["[CLS] [D] " + d for d in text]
            else:
                raise NotImplementedError(input_text_type)
            return super().__call__(text, max_length=max_length,
                                    add_special_tokens=False, **kwargs)

    return TCTTokenizerFast.from_pretrained(model_dir)
