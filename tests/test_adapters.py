"""Adapter protocol tests: ANCE/TCT end-to-end through dir loading + tokenizers."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

# TPU default matmul precision is bf16-ish: relax parity tolerances there
_ON_CPU = jax.devices()[0].platform == "cpu"
PAR_TOL = dict(rtol=2e-4, atol=2e-4) if _ON_CPU else dict(rtol=2e-2, atol=1e-2)
import jax.numpy as jnp

from repconc_tpu.models.auto import load_dense_encoder
from repconc_tpu.models.transformer import DenseEncoder


@pytest.fixture(scope="module")
def ance_dir(tmp_path_factory):
    """An ANCE-style checkpoint: roberta backbone + embeddingHead + norm,
    saved as a raw torch state dict like the reference adapter expects
    (examples/ance/modeling_ance.py:34-43)."""
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(3)
    d = tmp_path_factory.mktemp("ance")
    cfg = RobertaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64, pad_token_id=1)
    backbone = RobertaModel(cfg, add_pooling_layer=False).eval()
    head = torch.nn.Linear(32, 32)
    norm = torch.nn.LayerNorm(32)
    sd = {f"roberta.{k}": v for k, v in backbone.state_dict().items()}
    sd.update({f"embeddingHead.{k}": v for k, v in head.state_dict().items()})
    sd.update({f"norm.{k}": v for k, v in norm.state_dict().items()})
    torch.save(sd, d / "pytorch_model.bin")
    cfg.save_pretrained(d)
    return str(d), backbone, head, norm


def test_ance_adapter_dir_load(ance_dir, rng):
    path, backbone, head, norm = ance_dir
    enc_cfg, params, metric = load_dense_encoder(path, adapter="ance")
    assert enc_cfg.projection and enc_cfg.pooling == "cls"
    assert enc_cfg.model_type == "ance"

    ids = rng.integers(4, 64, size=(2, 8)).astype(np.int32)
    mask = np.ones((2, 8), dtype=np.int32)
    module = DenseEncoder(enc_cfg, "METRIC_IP")
    ours = np.asarray(module.apply({"params": params},
                                   jnp.asarray(ids), jnp.asarray(mask)))
    with torch.no_grad():
        h = backbone(torch.tensor(ids.astype(np.int64)),
                     torch.tensor(mask.astype(np.int64))).last_hidden_state
        theirs = norm(head(h[:, 0])).numpy()
    np.testing.assert_allclose(ours, theirs, **PAR_TOL)


def test_tct_tokenizer_protocol(tmp_path, rng):
    """TCT tokenizer: [CLS] [Q]/[D] markers, query padded to 36 with [MASK],
    add_special_tokens=False (modeling_tct.py:49-58)."""
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[Q]", "[D]",
             "hello", "world"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    base = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))
    # the real TCT checkpoints' tokenizers keep the markers atomic
    base.add_special_tokens({"additional_special_tokens": ["[Q]", "[D]"]})
    base.save_pretrained(tmp_path)

    from repconc_tpu.models.adapters import load_adapter_tokenizer

    tok = load_adapter_tokenizer(str(tmp_path), "tct")
    q = tok(["hello"], input_text_type="query")
    toks = tok.convert_ids_to_tokens(q["input_ids"][0])
    assert toks[:3] == ["[CLS]", "[Q]", "hello"]
    assert len(toks) == 36 and toks[-1] == "[MASK]"
    d = tok(["hello world"], input_text_type="doc", max_length=8)
    dtoks = tok.convert_ids_to_tokens(d["input_ids"][0])
    assert dtoks[:4] == ["[CLS]", "[D]", "hello", "world"]

    # the encode pipeline detects the protocol
    from repconc_tpu.eval.encode import accepts_text_type

    assert accepts_text_type(tok)


def test_ance_tokenizer_lowercases(tmp_path):
    from transformers import RobertaTokenizerFast

    # build a minimal roberta tokenizer via the tiny gpt2-style files
    import json

    # byte-level char vocab so both cases tokenize deterministically
    chars = {c: i + 5 for i, c in enumerate("helloHELLO")}
    vocab = {"<s>": 0, "</s>": 1, "<unk>": 2, "<pad>": 3, "<mask>": 4, **chars}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    base = RobertaTokenizerFast(vocab_file=str(tmp_path / "vocab.json"),
                                merges_file=str(tmp_path / "merges.txt"))
    base.save_pretrained(tmp_path)

    from repconc_tpu.models.adapters import load_adapter_tokenizer

    tok = load_adapter_tokenizer(str(tmp_path), "ance")
    lowered = base(["hello"])["input_ids"][0]
    upper = base(["Hello"])["input_ids"][0]
    adapted = tok(["Hello"])["input_ids"][0]
    assert adapted == lowered  # ANCE lower-cases before tokenizing
    assert adapted != upper
