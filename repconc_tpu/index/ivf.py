"""IVF-PQ: inverted-file pruning over the PQ code store, TPU-native.

The reference degenerates IVF to a single list (nlist=1, coarse centroid at
the origin) purely to reach faiss's fast GPU scan (evaluate_repconc.py:
101-118). This is a REAL inverted file — deliberately beyond the reference:

* coarse quantizer: k-means over (rotated) corpus embeddings, nlist cells;
* NO residual encoding (faiss by_residual=False equivalent): the PQ codes
  are identical to the flat index's codes, so the jointly-trained RepCONC
  codebook — and stage-2 centroid swaps — work unchanged; IVF is purely a
  pruning structure;
* TPU-static layout: every cell's posting list is padded to a fixed Lpad
  (a high quantile of list lengths); docs overflowing Lpad go to a SPILL
  segment that is brute-force scanned for every query, so recall semantics
  are exact w.r.t. the probed cells regardless of imbalance;
* probing: top-nprobe cells by the L2 rule argmax_c (q.c - ||c||^2/2).

Search implementations:
  search_xla    — correct everywhere (CPU tests), query-major gathers.
  The Pallas cell-grouped path lives in pallas_ivf.py (TPU serving).
"""
from __future__ import annotations

import dataclasses
import logging
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from repconc_tpu.index.kmeans import assign, kmeans_fit
from repconc_tpu.index.adc import build_lut

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class IVFIndex:
    """Host-side container; device arrays are materialized lazily."""

    coarse_centroids: np.ndarray   # (nlist, D) f32
    cell_codes: np.ndarray         # (nlist, Lpad, M) uint8, padded
    cell_ids: np.ndarray           # (nlist, Lpad) int32, -1 = pad
    cell_sizes: np.ndarray         # (nlist,) int32 (true sizes, <= Lpad)
    spill_codes: np.ndarray        # (S, M) uint8 (overflow docs)
    spill_ids: np.ndarray          # (S,) int32
    centroids: np.ndarray          # (M, K, dsub) f32 PQ codebook

    @property
    def nlist(self) -> int:
        return self.coarse_centroids.shape[0]

    @property
    def Lpad(self) -> int:
        return self.cell_codes.shape[1]

    @property
    def ntotal(self) -> int:
        return int(self.cell_sizes.sum()) + len(self.spill_ids)

    def set_centroids(self, centroids) -> None:
        """Stage-2 codebook swap (reference: replace_pq_centroids,
        run_repconc_eval.py:123-127) — just replace the array."""
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self._dev = None  # invalidate the device-resident copy

    def device_arrays(self):
        """(centroids, coarse, cell_codes, cell_ids) pinned on device ONCE.
        search_xla is called per query batch; re-uploading the ~200 MB code
        store per call through the ~10 MB/s tunnel would make any timed
        XLA-path measurement mostly transfer."""
        if getattr(self, "_dev", None) is None:
            self._dev = (jnp.asarray(self.centroids),
                         jnp.asarray(self.coarse_centroids),
                         jnp.asarray(self.cell_codes),
                         jnp.asarray(self.cell_ids))
        return self._dev

    # -- persistence ------------------------------------------------------
    def save(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        # atomic: at 8.8M docs this npz is ~0.5 GB and is written by
        # unattended pipeline stages — a crash mid-write must never leave a
        # partial archive that the next run's cache check would try to load
        tmp = os.path.join(out_dir, "ivf_index.tmp.npz")
        np.savez(
            tmp,
            coarse_centroids=self.coarse_centroids,
            cell_codes=self.cell_codes,
            cell_ids=self.cell_ids,
            cell_sizes=self.cell_sizes,
            spill_codes=self.spill_codes,
            spill_ids=self.spill_ids,
            centroids=self.centroids,
        )
        os.replace(tmp, os.path.join(out_dir, "ivf_index.npz"))

    @classmethod
    def load(cls, load_dir: str) -> "IVFIndex":
        z = np.load(os.path.join(load_dir, "ivf_index.npz"))
        return cls(**{k: z[k] for k in z.files})


class ReconstructionView:
    """Lazy (N, D) fp32 view over PQ codes: rows decode on demand via
    decode_gather. Lets build_ivf run WITHOUT the dense corpus embeddings —
    at MS MARCO scale (8.8M x 768) the fp32 embedding matrix is ~27 GB,
    while codes are 0.4 GB. The coarse partition built from reconstructions
    differs only within PQ quantization error, and recall semantics stay
    exact w.r.t. the probed cells (the IVF is purely a pruning structure)."""

    def __init__(self, codes: np.ndarray, pq_centroids: np.ndarray):
        from repconc_tpu.quant.codebook import decode_gather

        self._codes = codes
        self._cent = jnp.asarray(pq_centroids, dtype=jnp.float32)
        self._decode = jax.jit(decode_gather)
        D = pq_centroids.shape[0] * pq_centroids.shape[2]
        self.shape = (codes.shape[0], D)

    def __getitem__(self, idx) -> np.ndarray:
        rows = np.asarray(self._codes[idx]).astype(np.int32)
        return np.asarray(self._decode(jnp.asarray(rows), self._cent))

    def __array__(self, dtype=None, copy=None):
        # full materialization — only reached for small-N subsample paths
        full = self[slice(None)]
        return full.astype(dtype) if dtype is not None else full

    def __len__(self) -> int:
        return self.shape[0]

    def decode_device(self, idx) -> jnp.ndarray:
        """Decode rows and KEEP them on device (no host round-trip): the
        __getitem__ path pulls fp32 reconstructions to host, which through
        this environment's ~10 MB/s tunnel turns an 8.8M-doc coarse build
        into ~27 GB of downloads. Callers that feed the result straight
        back to a device computation (k-means training) use this."""
        rows = jnp.asarray(np.asarray(self._codes[idx]).astype(np.int32))
        return self._decode(rows, self._cent)


@jax.jit
def _decode_assign(codes_u8, pq_cent, coarse):
    """Fused reconstruction-space coarse assignment: uint8 codes up
    (~3 MB/chunk), int32 cells down (~256 KB/chunk) — never the (chunk, D)
    fp32 reconstruction through the host<->device tunnel (which would be
    ~2x200 MB per chunk, ~54 GB total at MS MARCO scale)."""
    from repconc_tpu.quant.codebook import decode_gather

    x = decode_gather(codes_u8.astype(jnp.int32), pq_cent)
    return assign(x, coarse)


def build_ivf_from_codes(codes: np.ndarray, pq_centroids: np.ndarray,
                         **kwargs) -> IVFIndex:
    """build_ivf when only the uint8 codes exist (no corpus_embeds on disk):
    the coarse quantizer trains on and assigns PQ reconstructions, decoded
    chunk-by-chunk on device. The reference cannot do this — its IVF path
    needs the full float matrix for faiss training."""
    return build_ivf(ReconstructionView(codes, pq_centroids), codes,
                     pq_centroids, **kwargs)


def build_ivf(
    corpus_embeds: np.ndarray,
    codes: np.ndarray,
    pq_centroids: np.ndarray,
    nlist: int = 4096,
    pad_quantile: float = 0.995,
    kmeans_iters: int = 20,
    max_train_points: int = 1 << 18,
    seed: int = 2022,
    assign_chunk: int = 1 << 16,
    balanced: bool = False,
) -> IVFIndex:
    """Build the inverted file.

    corpus_embeds: (N, D) ROTATED corpus embeddings (the space the PQ codes
    live in); codes: (N, M) uint8 flat PQ codes; pq_centroids: (M, K, dsub).
    balanced=True trains the coarse quantizer with the Sinkhorn uniform-
    assignment constraint (RepCONC's own constrained-clustering idea applied
    to the IVF level) — near-uniform list sizes, tight Lpad, little spill.
    """
    from repconc_tpu.index.opq import subsample_for_training

    N, D = corpus_embeds.shape
    nlist = min(nlist, N)
    is_view = isinstance(corpus_embeds, ReconstructionView)
    if is_view and N > max_train_points:
        # subsample the CODES on host, decode once on device, train there —
        # the generic path would decode on device, download fp32, and
        # re-upload for k-means (2x the bytes through the tunnel)
        rng_sub = np.random.default_rng(seed)
        idx = np.sort(rng_sub.choice(N, size=max_train_points, replace=False))
        train = corpus_embeds.decode_device(idx)
    else:
        train = subsample_for_training(corpus_embeds, max_train_points, seed)
    logger.info("IVF coarse k-means: nlist=%d on %d train points (balanced=%s)",
                nlist, len(train), balanced)
    if balanced:
        from repconc_tpu.index.kmeans import balanced_kmeans_fit

        coarse, _ = balanced_kmeans_fit(jnp.asarray(train, jnp.float32), nlist,
                                        iters=kmeans_iters,
                                        key=jax.random.key(seed))
    else:
        coarse, _ = kmeans_fit(jnp.asarray(train, jnp.float32), nlist,
                               iters=kmeans_iters, key=jax.random.key(seed))
    coarse = np.asarray(coarse)

    # assign every doc to its nearest cell, chunked
    cells = np.empty(N, dtype=np.int32)
    coarse_dev = jnp.asarray(coarse)
    assign_j = jax.jit(assign)
    for start in range(0, N, assign_chunk):
        stop = min(start + assign_chunk, N)
        if is_view:  # fused decode+assign: only codes cross the tunnel
            cells[start:stop] = np.asarray(_decode_assign(
                jnp.asarray(corpus_embeds._codes[start:stop]),
                corpus_embeds._cent, coarse_dev))
        else:
            cells[start:stop] = np.asarray(
                assign_j(jnp.asarray(corpus_embeds[start:stop]), coarse_dev))

    sizes = np.bincount(cells, minlength=nlist)
    Lpad = int(np.quantile(sizes, pad_quantile))
    # cap against pathological imbalance: very long lists spill instead of
    # inflating every cell's padding (and the serving kernel's work)
    Lpad = min(Lpad, int(4 * max(sizes.mean(), 1)))
    Lpad = max(int(np.ceil(Lpad / 128.0)) * 128, 128)
    logger.info("list sizes: mean %.1f max %d -> Lpad %d",
                sizes.mean(), sizes.max(), Lpad)

    M = codes.shape[1]
    cell_codes = np.zeros((nlist, Lpad, M), dtype=np.uint8)
    cell_ids = np.full((nlist, Lpad), -1, dtype=np.int32)

    # Vectorized fill (no per-cell python loop — it costs minutes at
    # MS MARCO scale with tens of thousands of cells): sort docs by cell,
    # compute each doc's RANK within its cell from the cell boundaries,
    # then one fancy-index scatter places every kept doc; ranks >= Lpad
    # form the spill segment in the same pass.
    order = np.argsort(cells, kind="stable").astype(np.int32)
    sorted_cells = cells[order]
    boundaries = np.searchsorted(sorted_cells, np.arange(nlist + 1))
    ranks = np.arange(N, dtype=np.int64) - boundaries[sorted_cells]
    kept = ranks < Lpad
    cell_codes[sorted_cells[kept], ranks[kept]] = codes[order[kept]]
    cell_ids[sorted_cells[kept], ranks[kept]] = order[kept]
    cell_fill = np.minimum(sizes, Lpad).astype(np.int32)

    spill_ids = order[~kept]
    spill_codes = (codes[spill_ids] if len(spill_ids)
                   else np.zeros((0, M), dtype=np.uint8))
    logger.info("spill segment: %d docs (%.3f%%)", len(spill_ids),
                100.0 * len(spill_ids) / max(N, 1))
    return IVFIndex(
        coarse_centroids=coarse,
        cell_codes=cell_codes,
        cell_ids=cell_ids,
        cell_sizes=cell_fill,
        spill_codes=spill_codes,
        spill_ids=spill_ids.astype(np.int32),
        centroids=np.asarray(pq_centroids, dtype=np.float32),
    )


@partial(jax.jit, static_argnames=("nprobe",))
def probe_cells(query_embeds, coarse_centroids, nprobe: int):
    """Top-nprobe cells per query by argmax (q.c - ||c||^2 / 2).

    approx_max_k at recall 1.0 = exact via the TPU PartialReduce op
    (lax.top_k's sort lowering is ~10x slower here)."""
    # HIGHEST: the probed-cell RANKING must match the fp32 CPU tests and
    # the build-time assignment (kmeans.assign) — default bf16 flips
    # near-tie cells at the nprobe boundary on TPU (CLAUDE.md rule)
    qc = jnp.dot(query_embeds, coarse_centroids.T,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    score = qc - 0.5 * jnp.sum(coarse_centroids ** 2, axis=-1)[None, :]
    if nprobe >= score.shape[1]:
        return jnp.broadcast_to(
            jnp.arange(score.shape[1], dtype=jnp.int32)[None, :],
            (score.shape[0], score.shape[1])).astype(jnp.int32)
    return jax.lax.approx_max_k(score, nprobe, recall_target=1.0)[1].astype(jnp.int32)


@partial(jax.jit, static_argnames=("nprobe", "topk"))
def _ivf_search_chunk_xla(
    lut,                # (Qc, M, K) f32
    cells,              # (Qc, nprobe) int32
    cell_codes,         # (nlist, Lpad, M) uint8 (device)
    cell_ids,           # (nlist, Lpad) int32
    nprobe: int,
    topk: int,
):
    Qc = lut.shape[0]
    M = cell_codes.shape[2]
    Lpad = cell_codes.shape[1]

    codes_g = jnp.take(cell_codes, cells, axis=0).astype(jnp.int32)
    ids_g = jnp.take(cell_ids, cells, axis=0)       # (Qc, nprobe, Lpad)
    codes_flat = codes_g.reshape(Qc, nprobe * Lpad, M)
    ids_flat = ids_g.reshape(Qc, nprobe * Lpad)

    def body(acc, m):
        table_m = lut[:, m, :]                       # (Qc, K)
        idx_m = codes_flat[:, :, m]                  # (Qc, P)
        vals = jax.vmap(jnp.take)(table_m, idx_m)    # per-query row gather
        return acc + vals, None

    acc = jnp.zeros(ids_flat.shape, dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(M))
    acc = jnp.where(ids_flat >= 0, acc, -jnp.inf)

    k = min(topk, acc.shape[1])
    # exact PartialReduce: run_ivf_sweep exercises this path ON TPU (the
    # --use_pallas off arm), where lax.top_k's k~1000 sort lowering can
    # wedge the remote compiler (CLAUDE.md)
    s, pos = jax.lax.approx_max_k(acc, k, recall_target=1.0)
    ids = jnp.take_along_axis(ids_flat, pos.astype(jnp.int32), axis=1)
    return s, ids


def search_xla(
    index: IVFIndex,
    query_embeds: np.ndarray,
    topk: int = 1000,
    nprobe: int = 64,
    query_chunk: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference IVF search (XLA everywhere). Returns (scores, DOC ROW IDS).

    Doc ids returned are row indices into the original corpus (as built),
    matching flat adc_search's contract.
    """
    from repconc_tpu.index.adc import adc_search

    nprobe = min(nprobe, index.nlist)
    q = jnp.asarray(query_embeds, dtype=jnp.float32)
    cent, coarse, cell_codes, cell_ids = index.device_arrays()

    all_s, all_i = [], []
    for start in range(0, q.shape[0], query_chunk):
        stop = min(start + query_chunk, q.shape[0])
        qc = q[start:stop]
        real = qc.shape[0]
        if real < query_chunk:
            qc = jnp.pad(qc, ((0, query_chunk - real), (0, 0)))
        lut = build_lut(qc, cent)
        cells = probe_cells(qc, coarse, nprobe)
        s, i = _ivf_search_chunk_xla(lut, cells, cell_codes, cell_ids,
                                     nprobe, topk)
        all_s.append(np.asarray(s[:real]))
        all_i.append(np.asarray(i[:real]))
    scores = np.concatenate(all_s, axis=0)
    ids = np.concatenate(all_i, axis=0)

    # spill segment: brute-force and merge
    if len(index.spill_ids):
        s_sp, i_sp = adc_search(query_embeds, index.spill_codes,
                                index.centroids,
                                topk=min(topk, len(index.spill_ids)))
        ids_sp = index.spill_ids[i_sp]
        scores = np.concatenate([scores, s_sp], axis=1)
        ids = np.concatenate([ids, ids_sp], axis=1)
        order = np.argsort(-scores, axis=1)[:, :topk]
        scores = np.take_along_axis(scores, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
    return scores, ids


def serve_search(
    index: IVFIndex,
    query_embeds: np.ndarray,
    topk: int = 1000,
    nprobe: int = 64,
    search_batch: int = 1200,
    mode: str = "auto",
    mesh=None,
    lut_dtype: str = "bf16",
    serving: str = "adc",
) -> Tuple[np.ndarray, np.ndarray]:
    """Deployed IVF serving path: the cell-grouped Pallas kernel on TPU, the
    XLA scan elsewhere. This is what the eval CLIs call — the same kernel
    `bench.py` headlines, matching the reference's contract that its eval IS
    its deployed fast scan (evaluate_repconc.py:188-206 batch_search).

    mode: "auto" (Pallas on TPU, XLA otherwise), "pallas" (forced — runs in
    interpret mode off-TPU, slow but exact), "xla".
    mesh: serve from a CELL-SHARDED index (1/W memory per device,
    ShardedPallasIVFIndex) instead of a device-resident copy.
    lut_dtype: "int8" serves with per-(query, group) quantized LUTs — the
    TPU analog of faiss's fp16-LUT mode one step further (~1% top-100
    churn, halves LUT gather traffic); single-chip and sharded Pallas
    paths. The XLA scan is the exact-scoring arm and ignores it (warning).
    serving: "decoded" keeps bf16 reconstructions of the whole corpus
    HBM-resident (D*2 bytes/doc vs M bytes/doc) and scores tiles as fat
    MXU matmuls — same scores to bf16 precision, no one-hot decode or LUT
    gather; "decoded_int8" stores scale-folded int8 reconstructions
    (D bytes/doc, MXU s8 path) — fits MS MARCO scale on one chip.
    Both work single-chip and mesh-sharded (each device decodes and holds
    only its own cells' reconstructions).

    Queries are served in fixed `search_batch` chunks, final short chunk
    padded, so every batch hits one jit cache entry (static shapes).
    """
    if mode == "auto":
        mode = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if mode == "xla":
        if lut_dtype != "bf16":
            logger.warning("serve_search: lut_dtype=%s applies to the Pallas "
                           "paths only; the XLA scan scores exact fp32 LUTs",
                           lut_dtype)
        if serving not in (None, "adc"):
            # mirror the lut_dtype warning: the caller asked for decoded
            # residency but the XLA scan scores exact LUTs from the codes —
            # don't let them believe the decoded path was exercised
            logger.warning("serve_search: serving=%s applies to the Pallas "
                           "paths only; the XLA scan serves from the code "
                           "store (exact scores)", serving)
        if mesh is not None:
            # honor the explicit XLA request: there is no mesh-sharded XLA
            # IVF scan, and silently serving with interpret-mode Pallas
            # kernels (the off-TPU fallback) would be orders of magnitude
            # slower than this single-device path
            logger.warning(
                "serve_search: mode='xla' has no mesh-sharded variant; "
                "searching single-device (encode stays data-parallel)")
        return search_xla(index, query_embeds, topk=topk, nprobe=nprobe)

    if mesh is not None:
        from repconc_tpu.index.pallas_ivf import ShardedPallasIVFIndex

        searcher = ShardedPallasIVFIndex(mesh, index)
    else:
        from repconc_tpu.index.pallas_ivf import PallasIVFIndex

        searcher = PallasIVFIndex(index, serving=serving)
    Q = query_embeds.shape[0]
    if Q == 0:
        return (np.zeros((0, topk), np.float32), np.zeros((0, topk), np.int64))
    search_batch = min(search_batch, Q)
    all_s, all_i = [], []
    for start in range(0, Q, search_batch):
        qc = np.asarray(query_embeds[start:start + search_batch],
                        dtype=np.float32)
        real = qc.shape[0]
        if real < search_batch:
            qc = np.pad(qc, ((0, search_batch - real), (0, 0)))
        s, i = searcher.search(qc, topk=topk, nprobe=nprobe,
                               lut_dtype=lut_dtype, serving=serving)
        all_s.append(s[:real])
        all_i.append(i[:real])
    return np.concatenate(all_s, axis=0), np.concatenate(all_i, axis=0)
