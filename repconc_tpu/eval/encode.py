"""Corpus/query batch encoding with XLA-friendly static shapes.

The reference leans on dynamic per-batch padding (eval_utils.py:114-133) and
length-sorted corpora (evaluate_repconc.py:140). XLA recompiles per shape, so
here batches are padded to a small set of BUCKET lengths (powers of two up to
max_seq_length) and a fixed batch size — a handful of compilations total,
then every batch hits the jit cache. Corpus is still sorted longest-first so
bucket transitions are monotone and padding waste is minimal.

Adapter tokenizer protocol: if the tokenizer's __call__ accepts
`input_text_type`, it is passed "query"/"doc" (the reference's custom-model
hook, finetune_repconc.py:68-69, preserved as the API contract).
"""
from __future__ import annotations

import inspect
import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repconc_tpu.core.config import RepConcConfig
from repconc_tpu.models import repconc_model

logger = logging.getLogger(__name__)

BUCKETS = (16, 32, 64, 128, 256, 512)


def accepts_text_type(tokenizer) -> bool:
    try:
        return "input_text_type" in inspect.getfullargspec(tokenizer.__call__)[0]
    except TypeError:
        return False


def tokenize_batch(tokenizer, texts, max_length: int, input_text_type: str):
    kwargs = {"input_text_type": input_text_type} if accepts_text_type(tokenizer) else {}
    out = tokenizer(texts, padding=True, truncation=True, max_length=max_length,
                    **kwargs)
    ids = np.asarray(out["input_ids"], dtype=np.int32)
    mask = np.asarray(out["attention_mask"], dtype=np.int32)
    return ids, mask


def pad_to_bucket(ids: np.ndarray, mask: np.ndarray, max_length: int,
                  pad_token_id: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    L = ids.shape[1]
    bucket = next((b for b in BUCKETS if b >= L and b <= max_length), max_length)
    bucket = min(bucket, max_length)
    if L < bucket:
        ids = np.pad(ids, ((0, 0), (0, bucket - L)), constant_values=pad_token_id)
        mask = np.pad(mask, ((0, 0), (0, bucket - L)))
    elif L > bucket:
        ids, mask = ids[:, :bucket], mask[:, :bucket]
    return ids, mask


class TokenCache:
    """Offline tokenization cache for corpus encoding.

    On a many-core host the reference hides tokenization cost inside
    DataLoader workers (evaluate_repconc.py:147-153). This host has ONE
    core, so even with the producer-thread overlap below, large-corpus
    encode is tokenize-bound (measured at 8.8M docs: 180 s/shard tokenize
    vs 93 s/shard device — the device idles half the time). This cache
    moves tokenization fully offline (cli/run_pretokenize.py, runnable on
    any idle CPU window), after which encode is device-bound.

    Layout: `ids.npy` (n, width) in the narrowest dtype that holds the
    vocab, `lengths.npy` (n,), and `token_meta.json` keyed on corpus
    fingerprint, tokenizer fingerprint, max_seq_length and text type.
    Per-doc ids are stored truncated but NOT batch-padded, so slicing
    reconstructs `tokenize_batch`'s output exactly for ANY batch size:
    HF pads to the longest row in the batch and the attention mask is a
    length ramp — both recomputed here from `lengths`.
    """

    META = "token_meta.json"

    def __init__(self, ids: np.ndarray, lengths: np.ndarray, offset: int = 0):
        self._ids = ids
        self._lengths = lengths
        self._offset = offset

    # -- identity -----------------------------------------------------------
    @staticmethod
    def tokenizer_fingerprint(tokenizer) -> str:
        import hashlib

        h = hashlib.sha1(type(tokenizer).__name__.encode())
        try:
            vocab = tokenizer.get_vocab()
            for tok, idx in sorted(vocab.items(), key=lambda kv: kv[1]):
                h.update(f"{tok}\x00{idx}\x01".encode("utf-8", "ignore"))
        except AttributeError:  # adapter tokenizers without get_vocab
            h.update(repr(tokenizer).encode("utf-8", "ignore"))
        return h.hexdigest()

    @classmethod
    def _meta(cls, texts, tokenizer, max_seq_length: int,
              input_text_type: str, corpus_fp: Optional[str] = None) -> dict:
        return {"n": len(texts),
                "max_seq_length": int(max_seq_length),
                "input_text_type": input_text_type,
                "corpus_fp": corpus_fp or _corpus_fingerprint(texts),
                "tokenizer_fp": cls.tokenizer_fingerprint(tokenizer)}

    # -- build / open -------------------------------------------------------
    @classmethod
    def build(cls, texts, tokenizer, max_seq_length: int, cache_dir: str,
              input_text_type: str = "doc", chunk: int = 8192,
              corpus_fp: Optional[str] = None, verbose: bool = False) -> "TokenCache":
        """Tokenize `texts` (already in encode order) into `cache_dir`."""
        os.makedirs(cache_dir, exist_ok=True)
        meta = cls._meta(texts, tokenizer, max_seq_length, input_text_type,
                         corpus_fp)
        n = len(texts)
        vocab_size = getattr(tokenizer, "vocab_size", None) or (1 << 31) - 1
        dtype = "uint16" if vocab_size < (1 << 16) else "int32"
        ids_path = os.path.join(cache_dir, "ids.npy")
        tmp = ids_path + ".tmp"
        ids_mm = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=dtype, shape=(n, max_seq_length))
        lengths = np.zeros((n,), dtype=np.int32)
        for start in range(0, n, chunk):
            batch = list(texts[start:start + chunk])
            bids, bmask = tokenize_batch(tokenizer, batch, max_seq_length,
                                         input_text_type)
            lens = bmask.sum(axis=1)
            width = bids.shape[1]
            ids_mm[start:start + len(batch), :width] = bids
            lengths[start:start + len(batch)] = lens
            if verbose and (start // chunk) % 20 == 0:
                logger.info("pretokenize %d/%d", min(start + chunk, n), n)
        ids_mm.flush()
        del ids_mm
        os.replace(tmp, ids_path)
        np.save(os.path.join(cache_dir, "lengths.npy"), lengths)
        with open(os.path.join(cache_dir, cls.META), "w") as f:
            json.dump(meta, f)
        return cls(np.load(ids_path, mmap_mode="r"), lengths)

    @classmethod
    def open(cls, cache_dir: Optional[str], texts, tokenizer,
             max_seq_length: int, input_text_type: str = "doc",
             corpus_fp: Optional[str] = None) -> Optional["TokenCache"]:
        """Open a cache if it exactly matches (corpus, tokenizer, settings);
        return None (with a warning) otherwise — callers fall back to online
        tokenization, never to stale tokens."""
        if cache_dir is None:
            return None
        meta_path = os.path.join(cache_dir, cls.META)
        if not os.path.exists(meta_path):
            logger.warning("token cache %s: not built — tokenizing online",
                           cache_dir)
            return None
        try:
            with open(meta_path) as f:
                have = json.load(f)
            want = cls._meta(texts, tokenizer, max_seq_length,
                             input_text_type, corpus_fp)
            if have != want:
                diff = [k for k in want if have.get(k) != want[k]]
                logger.warning("token cache %s is stale (mismatch: %s) — "
                               "tokenizing online", cache_dir, diff)
                return None
            ids = np.load(os.path.join(cache_dir, "ids.npy"), mmap_mode="r")
            lengths = np.load(os.path.join(cache_dir, "lengths.npy"))
        except (OSError, ValueError, json.JSONDecodeError) as e:
            logger.warning("token cache %s unreadable (%s) — tokenizing "
                           "online", cache_dir, e)
            return None
        logger.info("token cache hit: %s (%d docs)", cache_dir, len(lengths))
        return cls(ids, lengths)

    # -- use ----------------------------------------------------------------
    def slice(self, start: int, stop: int) -> "TokenCache":
        """A zero-copy view over [start, stop) — matches encode_corpus's
        texts[start:stop] shard slicing."""
        return TokenCache(self._ids, self._lengths, offset=self._offset + start)

    def batch(self, start: int, batch_size: int, n: int):
        """Rows [start, start+batch_size) of the view, the tail padded with
        copies of the last real row — bit-identical to tokenize_batch() on
        the equivalent copy-padded text batch. `n` is the view's text count."""
        real = min(batch_size, n - start)
        lo = self._offset + start
        lens = np.asarray(self._lengths[lo:lo + real])
        # one contiguous memmap read (row-by-row fancy indexing is ~10x
        # slower); tail copies are appended host-side
        ids = np.asarray(self._ids[lo:lo + real], dtype=np.int32)
        if real < batch_size:
            pad = batch_size - real
            lens = np.concatenate([lens, np.repeat(lens[-1:], pad)])
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
        width = max(int(lens.max()), 1)
        ids = ids[:, :width]
        mask = (np.arange(width)[None, :] < lens[:, None]).astype(np.int32)
        return ids, mask


def _encode_fn(config: RepConcConfig, output: str, mesh=None):
    """Jitted encode fn; with `mesh`, the batch dim shards over the mesh's
    data axis (SPMD replacement for the reference's DDP predict sharding,
    evaluate_repconc.py:147-153)."""
    if output == "code":
        def fn(params, ids, mask):
            out = repconc_model.forward(config, params, ids, mask,
                                        return_code=True, use_constraint=False)
            return out.discrete_codes
    else:
        def fn(params, ids, mask):
            return repconc_model.encode_continuous(config, params, ids, mask)
    if mesh is not None:
        from repconc_tpu.parallel.sharded import sharded_encode_fn

        return sharded_encode_fn(mesh, fn)
    return jax.jit(fn)


def prepare_encoder(config: RepConcConfig, params, output: str, mesh=None):
    """Build the jitted encode fn ONCE and pin params on device ONCE.

    Returns an opaque `(fn, params_on_device)` pair for encode_texts's
    `prepared=` argument. Callers that encode in several slices (the
    shard-resumable corpus loop below) MUST reuse one prepared pair: each
    `jax.jit` wrapper owns its own compilation cache, so rebuilding the fn
    per slice re-traces and re-compiles — 60-120 s per shard through this
    environment's remote-compile tunnel."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(mesh, P()))
    else:
        params = jax.tree.map(jnp.asarray, params)
    return _encode_fn(config, output, mesh=mesh), params


def encode_texts(
    texts,
    config: RepConcConfig,
    params,
    tokenizer,
    max_seq_length: int,
    batch_size: int = 256,
    output: str = "continuous_embedding",
    input_text_type: str = "doc",
    verbose: bool = False,
    mesh=None,
    stopwatch=None,
    prepared=None,
    token_cache: Optional["TokenCache"] = None,
) -> np.ndarray:
    """Encode a list of texts to codes (uint8) or continuous embeds (fp32).

    mesh: shard each encode batch over the mesh's data axis (batch_size is
    rounded up to a multiple of the mesh size).
    prepared: `(fn, params)` from prepare_encoder — reuse across calls to
    avoid per-call re-jit (and per-call param re-pinning).
    token_cache: a TokenCache view aligned with `texts` — the producer
    slices precomputed tokens instead of running the tokenizer."""
    limit = config.encoder.max_position_embeddings - config.encoder.position_offset
    if max_seq_length > limit:
        logger.warning("max_seq_length %d exceeds the encoder's position table"
                       " (%d); truncating", max_seq_length, limit)
        max_seq_length = limit
    if mesh is not None and batch_size % mesh.size != 0:
        batch_size += -batch_size % mesh.size
    # Pin params on device ONCE: host numpy leaves passed to a jitted fn are
    # re-transferred on EVERY call — ~370 MB/batch through this
    # environment's ~10 MB/s host<->device tunnel (measured: 31 docs/s
    # instead of ~3,000 before this line).
    n = len(texts)
    if n == 0:  # an empty query/corpus file: return the right shape instead
        #         of np.concatenate([]) exploding three layers down
        width = (config.MCQ_M if output == "code"
                 else config.encoder.hidden_size)
        dtype = np.uint8 if output == "code" else np.float32
        return np.zeros((0, width), dtype=dtype)
    fn, params = (prepared if prepared is not None
                  else prepare_encoder(config, params, output, mesh=mesh))
    pad_id = config.encoder.pad_token_id
    outs = []
    from repconc_tpu.core.profiling import Stopwatch

    sw = stopwatch if stopwatch is not None else Stopwatch()

    # Tokenization runs in a producer thread, overlapped with device compute
    # (the reference overlaps via DataLoader workers, run_repconc_eval.py
    # dataloader_num_workers). The HF fast tokenizer (Rust) and the device
    # dispatch both release the GIL, so one prefetch thread hides most of
    # the host-side cost; "tokenize" time is accounted inside the producer,
    # so wall-clock ~ max(tokenize, device_encode) when fully overlapped.
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
    stop = threading.Event()  # consumer died: unblock + end the producer

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue_mod.Full:
                continue
        return False

    def producer():
        try:
            for start in range(0, n, batch_size):
                if stop.is_set():
                    return
                real = min(batch_size, n - start)
                with sw("tokenize"):
                    if token_cache is not None:
                        ids, mask = token_cache.batch(start, batch_size, n)
                    else:
                        batch = list(texts[start:start + batch_size])
                        if real < batch_size:  # static shape: pad with copies
                            batch = batch + [batch[-1]] * (batch_size - real)
                        ids, mask = tokenize_batch(tokenizer, batch,
                                                   max_seq_length,
                                                   input_text_type)
                    ids, mask = pad_to_bucket(ids, mask, max_seq_length,
                                              pad_id)
                if not _put((start, real, ids, mask)):
                    return
            _put(None)
        except BaseException as e:  # surface tokenizer errors to the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            start, real, ids, mask = item
            with sw("device_encode"):
                res = np.asarray(fn(params, jnp.asarray(ids),
                                    jnp.asarray(mask)))[:real]
            outs.append(res)
            if verbose and (start // batch_size) % 50 == 0:
                logger.info("encoded %d/%d", min(start + batch_size, n), n)
    finally:
        # on an encode failure the producer would otherwise block forever
        # on q.put into the full queue (thread + batches leak per retry)
        stop.set()
        t.join(timeout=30)
    if verbose:
        logger.info("encode phase split: %s",
                    {k: round(v, 2) for k, v in sw.totals.items()})
    out = np.concatenate(outs, axis=0)
    return out.astype(np.uint8) if output == "code" else out.astype(np.float32)


def _params_fingerprint(params) -> str:
    """Cheap, stable model fingerprint: per-leaf (path, shape, sum, sum-of-
    squares) digested. One vectorized pass over the tree (~100 ms at
    bert-base) — full byte-hashing 440 MB of weights is not needed to tell
    checkpoints apart."""
    import hashlib

    h = hashlib.sha1()
    for path, leaf in sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                             key=lambda kv: str(kv[0])):
        a = np.asarray(leaf)
        s1 = float(np.sum(a, dtype=np.float64))
        s2 = float(np.sum(np.square(a, dtype=np.float64)))
        # full double precision: at %.6e (7 significant digits) a lightly
        # trained checkpoint (relative param change < 1e-7, e.g. a few tiny-
        # lr steps) would fingerprint identically and silently reuse stale
        # shards; %.17e round-trips the float64 sums exactly
        h.update(f"{path}|{a.shape}|{s1:.17e}|{s2:.17e}".encode())
    return h.hexdigest()


def _corpus_fingerprint(texts) -> str:
    """Content hash of the (length-sorted) text list — catches any document
    edit, including ones that keep n and the boundary ids unchanged."""
    import hashlib

    h = hashlib.sha1()
    for t in texts:
        h.update(t.encode("utf-8", "ignore"))
        h.update(b"\x00")
    return h.hexdigest()


def encode_corpus(
    corpus: Dict[Any, str],
    config: RepConcConfig,
    params,
    tokenizer,
    max_seq_length: int,
    batch_size: int = 256,
    output: str = "code",
    mesh=None,
    stopwatch=None,
    cache_dir: Optional[str] = None,
    shard_size: int = 262144,
    token_cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode a {docid: text} corpus, longest-first
    (reference: evaluate_repconc.py:138-159). Returns (codes_or_embeds, corpus_ids).

    cache_dir: shard-level resume. Encoded output is flushed to
    `cache_dir/shard_NNNNNN.npy` every `shard_size` docs (atomic rename), so
    a killed run (worker crash, tunnel death) resumes from the last complete
    shard instead of re-encoding everything — the reference gets the same
    property from its Trainer predict caching; at 8.8M docs / ~45 min per
    encode this is the difference between losing minutes and losing the run.
    A meta.json (n, output, max_seq_length, shard_size, boundary doc ids)
    invalidates stale shards when the corpus or encode settings change. The
    sort above is deterministic, so shard boundaries line up across runs."""
    logger.info("Sorting corpus by document length (longest first)...")
    corpus_ids = np.array(sorted(corpus, key=lambda k: len(corpus[k]), reverse=True))
    texts = [corpus[cid] for cid in corpus_ids]
    corpus_fp = _corpus_fingerprint(texts)
    # offline tokens (cli/run_pretokenize.py); the open() is keyed on the
    # SAME clamped length encode_texts will tokenize at
    limit = config.encoder.max_position_embeddings - config.encoder.position_offset
    token_cache = TokenCache.open(token_cache_dir, texts, tokenizer,
                                  min(max_seq_length, limit),
                                  input_text_type="doc", corpus_fp=corpus_fp)
    if cache_dir is None:
        enc = encode_texts(texts, config, params, tokenizer, max_seq_length,
                           batch_size, output=output, input_text_type="doc",
                           verbose=True, mesh=mesh, stopwatch=stopwatch,
                           token_cache=token_cache)
        return enc, corpus_ids

    n = len(texts)
    # batch_size deliberately NOT in the key: tail batches are padded with
    # copies and sliced off, so output is batch-size independent — and the
    # natural recovery from an OOM mid-encode is rerunning with a SMALLER
    # batch, which must reuse the finished shards, not wipe them.
    # params/corpus fingerprints ARE in the key: without them, shards from a
    # different checkpoint (rerun after retraining into the same out dir) or
    # an edited corpus would be silently reused — or worse, mixed, half the
    # corpus encoded by model A and half by model B.
    meta = {"n": n, "output": output, "max_seq_length": max_seq_length,
            "shard_size": shard_size,
            "first_id": str(corpus_ids[0]), "last_id": str(corpus_ids[-1]),
            "params_fp": _params_fingerprint(params),
            "corpus_fp": corpus_fp}
    os.makedirs(cache_dir, exist_ok=True)
    meta_path = os.path.join(cache_dir, "meta.json")
    stale = True
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                stale = json.load(f) != meta
        except (json.JSONDecodeError, OSError):
            stale = True
    if stale:
        for name in os.listdir(cache_dir):
            if name.startswith("shard_") or name.startswith(".shard_"):
                os.remove(os.path.join(cache_dir, name))
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    prepared = None  # built lazily: an all-cached resume touches no device
    out = None       # preallocated on the first shard: holding all shards
    #                  plus a concatenated copy would double peak host
    #                  memory (~54 GB transient at 8.8M-doc dense scale)
    for i, start in enumerate(range(0, n, shard_size)):
        path = os.path.join(cache_dir, f"shard_{i:06d}.npy")
        if os.path.exists(path):
            enc = np.load(path)
        else:
            if prepared is None:
                prepared = prepare_encoder(config, params, output, mesh=mesh)
            enc = encode_texts(texts[start:start + shard_size], config,
                               params, tokenizer, max_seq_length, batch_size,
                               output=output, input_text_type="doc",
                               verbose=True, mesh=mesh, stopwatch=stopwatch,
                               prepared=prepared,
                               token_cache=token_cache.slice(
                                   start, start + shard_size)
                               if token_cache is not None else None)
            tmp = os.path.join(cache_dir, f".shard_{i:06d}.tmp.npy")
            np.save(tmp, enc)
            os.replace(tmp, path)
            logger.info("encode shard %d (%d/%d docs) flushed to %s",
                        i, min(start + shard_size, n), n, path)
        if out is None:
            out = np.empty((n,) + enc.shape[1:], dtype=enc.dtype)
        out[start:start + len(enc)] = enc
    return out, corpus_ids


def clear_encode_cache(cache_dir: Optional[str]) -> None:
    """Remove a shard-resume cache after the final artifact is safely saved."""
    if cache_dir is None or not os.path.isdir(cache_dir):
        return
    for name in os.listdir(cache_dir):
        if (name.startswith("shard_") or name.startswith(".shard_")
                or name == "meta.json"):
            os.remove(os.path.join(cache_dir, name))
    try:
        os.rmdir(cache_dir)
    except OSError:
        pass


def encode_queries(
    queries: Dict[Any, str],
    config: RepConcConfig,
    params,
    tokenizer,
    max_seq_length: int,
    batch_size: int = 256,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode queries to continuous fp32 embeddings, sorted by qid
    (reference: evaluate_repconc.py:162-177)."""
    query_ids = sorted(queries.keys())
    texts = [queries[qid] for qid in query_ids]
    embeds = encode_texts(texts, config, params, tokenizer, max_seq_length,
                          batch_size, output="continuous_embedding",
                          input_text_type="query", mesh=mesh)
    return embeds, np.array(query_ids)
