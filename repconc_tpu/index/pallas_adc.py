"""Pallas TPU kernel for ADC (PQ) scoring — the serving hot path.

Replaces faiss's CUDA IVFPQ scan (reference: evaluate_repconc.py:121-135,
188-206). PQ scoring is score(q, n) = sum_m LUT[q, m, codes[n, m]]. GPUs do
per-element LUT gathers; the TPU's vector gather unit cannot index a 256-row
table (one vreg limit), but the MXU eats structured matmuls. The TPU-native
formulation is a ONE-HOT CONTRACTION

    scores = LUT_flat (Q, M*K)  @  onehot(codes) (N, M*K)^T

which is exact (one-hot entries select LUT cells) and runs at MXU speed.
Doing this in XLA would materialize onehot in HBM (~50GB of traffic per 1M
docs); the kernel instead builds each (doc_tile, GM*K) one-hot slice in VMEM
registers from the raw uint8 codes and contracts it immediately —
the only HBM traffic is the codes themselves (M bytes/doc) and the output
scores.

Layout: m-subspaces are processed in groups of GM (=8 when M%8==0). Within a
group the lane axis is ordered k-major: lane l <-> (m = g*GM + l%GM,
k = l//GM), matching `pltpu.repeat`'s CONCAT semantics for expanding the
code columns. The LUT is pre-permuted to the same order outside the kernel
(cheap, per query batch).

Scheduling: the grid is (doc_tiles, query_tiles) with QUERIES FASTEST, and
the doc tile's one-hot expansion lives in VMEM scratch: it is built by the
VPU once per doc tile (at query step 0) and contracted on the MXU against
every resident query-LUT tile. With Q-fastest ordering the one-hot build —
which otherwise rivals the matmul in time and caps MXU utilization at ~35%
— is amortized over Q/QUERY_TILE steps. Scratch persists across grid steps
(Pallas TPU grids are sequential per core) and the codes block's index map
is q-invariant, so Pallas skips its re-DMA on non-zero query steps.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    """Pallas interpret mode: on by default off-TPU so every kernel executes
    (and is correctness-tested) in CPU runs, not only when TPU-gated."""
    if os.environ.get("REPCONC_PALLAS_INTERPRET") == "1":
        return True
    return jax.devices()[0].platform != "tpu"

DOC_TILE = 128     # docs per grid step; bf16 one-hot scratch is NT x M*K
DOC_TILE_I8 = 256  # int8 one-hot scratch is half the bytes -> bigger tile
QUERY_TILE = 128   # queries per grid step (2 buffered LUT blocks of QTxMK)


def _group_size(M: int, K: int) -> int:
    for gm in (8, 4, 2, 1):
        if M % gm == 0 and (gm * K) % 128 == 0:
            return gm
    raise ValueError(f"unsupported (M={M}, K={K})")


def permute_lut(lut: jnp.ndarray, gm: int) -> jnp.ndarray:
    """(Q, M, K) -> (Q, M*K) grouped k-major: out[q, g*(gm*K) + k*gm + j]
    = lut[q, g*gm + j, k]."""
    Q, M, K = lut.shape
    g = M // gm
    # (Q, g, gm, K) -> (Q, g, K, gm) -> (Q, M*K)
    return lut.reshape(Q, g, gm, K).transpose(0, 1, 3, 2).reshape(Q, M * K)


def _build_onehot(gm: int, K: int, codes_ref, onehot_ref) -> None:
    """Expand a (NT, M) uint8 code tile into its (NT, M*K) one-hot in VMEM
    scratch, grouped-k-major to match permute_lut's LUT layout."""
    NT, M = codes_ref.shape
    G = M // gm
    lanes = gm * K
    codes = codes_ref[:].astype(jnp.int32)
    k_of_lane = jax.lax.broadcasted_iota(
        jnp.int32, (NT, lanes), dimension=1) // gm
    for g in range(G):  # static unroll over m-groups
        cols = codes[:, g * gm:(g + 1) * gm]              # (NT, gm)
        expanded = pltpu.repeat(cols, K, axis=1)          # (NT, gm*K) concat
        onehot_ref[:, g * lanes:(g + 1) * lanes] = (
            expanded == k_of_lane).astype(onehot_ref.dtype)


def _adc_onehot_kernel(gm: int, K: int, lut_ref, codes_ref, out_ref,
                       onehot_ref):
    """lut_ref: (QT, M*K) bf16 grouped-k-major; codes_ref: (NT, M) uint8
    (widened in VMEM); out_ref: (QT, NT) f32; onehot_ref: (NT, M*K) bf16
    scratch, built once per doc tile (query grid axis is fastest) and
    reused for every query tile."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        _build_onehot(gm, K, codes_ref, onehot_ref)

    out_ref[:] = jax.lax.dot_general(
        lut_ref[:], onehot_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _adc_onehot_kernel_i8(gm: int, K: int, lut_ref, scale_ref, codes_ref,
                          out_ref, onehot_ref):
    """int8 variant: lut_ref (QT, M*K) int8 quantized per (query, group)
    with scale_ref (QT, G) f32; the one-hot is int8 so every contraction
    runs the MXU's s8xs8->s32 path (2x the bf16 rate). Per-group dots so
    each partial sum is rescaled by its group's dequantization factor."""
    NT, M = codes_ref.shape
    G = M // gm
    lanes = gm * K

    @pl.when(pl.program_id(1) == 0)
    def _():
        _build_onehot(gm, K, codes_ref, onehot_ref)

    acc = jnp.zeros((out_ref.shape[0], NT), dtype=jnp.float32)
    for g in range(G):
        lut_g = lut_ref[:, g * lanes:(g + 1) * lanes]
        part = jax.lax.dot_general(
            lut_g, onehot_ref[:, g * lanes:(g + 1) * lanes],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * scale_ref[:, g:g + 1]
    out_ref[:] = acc


def quantize_lut_int8(lut_perm: jnp.ndarray, gm: int, K: int):
    """Per-(query, group) symmetric int8 quantization of the permuted LUT.

    Returns (lut_i8 (Q, M*K) int8, scales (Q, G) f32). Dequantized scores
    carry <= scale/2 error per term — comparable to the bf16 path (the
    reference's faiss uses fp16 LUTs above M=56, evaluate_repconc.py:126)."""
    Q, MK = lut_perm.shape
    lanes = gm * K
    G = MK // lanes
    grouped = lut_perm.reshape(Q, G, lanes)
    amax = jnp.max(jnp.abs(grouped), axis=-1)            # (Q, G)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(grouped / scale[:, :, None]), -127, 127)
    return q.astype(jnp.int8).reshape(Q, MK), scale


@functools.partial(jax.jit, static_argnames=("K",))
def adc_scores_pallas_int8(
    lut_i8: jnp.ndarray,     # (Q, M*K) int8 (quantize_lut_int8 output)
    scales: jnp.ndarray,     # (Q, G) f32
    codes: jnp.ndarray,      # (Nc, M) int32; Nc % DOC_TILE_I8 == 0
    K: int,
) -> jnp.ndarray:
    Q, MK = lut_i8.shape
    Nc, M = codes.shape
    # floor-division grids silently drop a tail tile (unwritten output =
    # garbage scores that can win the top-k); reject bad shapes instead
    assert Nc % DOC_TILE_I8 == 0 and Q % QUERY_TILE == 0, (Nc, Q)
    gm = _group_size(M, K)
    G = M // gm
    kernel = functools.partial(_adc_onehot_kernel_i8, gm, K)
    grid = (Nc // DOC_TILE_I8, Q // QUERY_TILE)  # queries fastest
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_TILE, MK), lambda n, q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_TILE, G), lambda n, q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DOC_TILE_I8, M), lambda n, q: (n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_TILE, DOC_TILE_I8), lambda n, q: (q, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, Nc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((DOC_TILE_I8, MK), jnp.int8)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * Nc * MK,
            bytes_accessed=Nc * M * 4 + Q * MK + Q * Nc * 4,
            transcendentals=0,
        ),
    )(lut_i8, scales, codes)


@functools.partial(jax.jit, static_argnames=("K",))
def adc_scores_pallas(
    lut_perm: jnp.ndarray,   # (Q, M*K) bf16, permute_lut output
    codes: jnp.ndarray,      # (Nc, M) uint8; Nc % DOC_TILE == 0
    K: int,
) -> jnp.ndarray:
    """Scores (Q, Nc) for one code chunk. Q % QUERY_TILE == 0."""
    Q, MK = lut_perm.shape
    Nc, M = codes.shape
    assert Nc % DOC_TILE == 0 and Q % QUERY_TILE == 0, (Nc, Q)
    gm = _group_size(M, K)
    kernel = functools.partial(_adc_onehot_kernel, gm, K)
    grid = (Nc // DOC_TILE, Q // QUERY_TILE)  # queries fastest
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QUERY_TILE, MK), lambda n, q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DOC_TILE, M), lambda n, q: (n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((QUERY_TILE, DOC_TILE), lambda n, q: (q, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, Nc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((DOC_TILE, MK), jnp.bfloat16)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * Nc * MK,
            bytes_accessed=Nc * M + Q * MK * 2 + Q * Nc * 4,
            transcendentals=0,
        ),
    )(lut_perm, codes)


from repconc_tpu.index.flat import topk_wide  # noqa: E402  (shared top-k)


@functools.partial(jax.jit,
                   static_argnames=("topk", "K", "chunk", "exact"))
def _search_device(lut_perm, codes_padded, n_valid, topk: int, K: int,
                   chunk: int, exact: bool):
    """One-dispatch search: lax.scan over corpus chunks, each step = pallas
    scoring + per-chunk top-k; all chunks' candidates are merged by ONE
    final top-k (a per-chunk running merge costs a ~45 ms sort per chunk).
    codes_padded: (nc*chunk, M); n_valid: scalar count of real (non-pad)
    docs — traced, so sharded callers can pass per-device counts."""
    Q = lut_perm.shape[0]
    M = codes_padded.shape[1]
    nc = codes_padded.shape[0] // chunk
    codes_c = codes_padded.reshape(nc, chunk, M)
    local_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    k_chunk = min(topk, chunk)

    def body(_, xs):
        ci, codes_chunk = xs
        scores = adc_scores_pallas(lut_perm, codes_chunk, K)
        base = ci * chunk
        valid = (base + local_iota) < n_valid
        scores = jnp.where(valid, scores, -jnp.inf)
        s, i = topk_wide(scores, k_chunk, exact)
        return None, (s, i.astype(jnp.int32) + base)

    _, (all_s, all_i) = jax.lax.scan(
        body, None, (jnp.arange(nc, dtype=jnp.int32), codes_c))
    # (nc, Q, k) -> (Q, nc*k); one exact merge across chunks
    cand_s = jnp.swapaxes(all_s, 0, 1).reshape(Q, nc * k_chunk)
    cand_i = jnp.swapaxes(all_i, 0, 1).reshape(Q, nc * k_chunk)
    if nc == 1:
        return cand_s, cand_i
    s, pos = topk_wide(cand_s, min(topk, nc * k_chunk), exact)
    return s, jnp.take_along_axis(cand_i, pos, axis=1)


class PallasADCIndex:
    """Device-resident PQ code index with Pallas-kernel search.

    The TPU counterpart of faiss's GPU index residency
    (evaluate_repconc.py:121-135): codes live in HBM once; every search is a
    single jitted dispatch.
    """

    def __init__(self, codes, centroids, chunk_size: int = 1 << 17):
        codes = np.asarray(codes)
        self.N, self.M = codes.shape
        self.K = centroids.shape[1]
        # chunk must be a DOC_TILE multiple: the kernel grid floor-divides,
        # so a ragged chunk would leave an unwritten (garbage) output tail
        chunk_size = max(DOC_TILE, (chunk_size // DOC_TILE) * DOC_TILE)
        self.chunk = min(chunk_size, _round_up(self.N, DOC_TILE))
        npad = _round_up(self.N, self.chunk)
        padded = np.zeros((npad, self.M), dtype=np.uint8)
        padded[:self.N] = codes
        self.codes = jnp.asarray(padded)  # 1 byte/code in HBM
        self.set_centroids(centroids)

    def set_centroids(self, centroids):
        """Swap codebooks (stage-2 centroid updates are just this)."""
        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)

    def search_device(self, query_embeds, topk: int = 1000, exact: bool = True):
        """Search returning device arrays (scores, indices), each (Q, topk)."""
        from repconc_tpu.index.adc import build_lut

        q = jnp.asarray(query_embeds, dtype=jnp.float32)
        gm = _group_size(self.M, self.K)
        lut_perm = permute_lut(build_lut(q, self.centroids), gm).astype(jnp.bfloat16)
        Q = q.shape[0]
        qpad = (-Q) % QUERY_TILE
        if qpad:
            lut_perm = jnp.pad(lut_perm, ((0, qpad), (0, 0)))
        topk = min(topk, self.N)
        s, i = _search_device(lut_perm, self.codes, self.N, topk, self.K,
                              self.chunk, exact)
        return s[:Q], i[:Q]

    def search(self, query_embeds, topk: int = 1000, exact: bool = True):
        s, i = self.search_device(query_embeds, topk, exact)
        return np.asarray(s), np.asarray(i)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def adc_search_pallas(
    query_embeds,
    codes,
    centroids,
    topk: int = 1000,
    chunk_size: int = 1 << 17,
    exact: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot brute-force ADC top-k via the Pallas kernel.

    Same contract as index.adc.adc_search; codes may live on host as uint8.
    LUT entries are rounded to bf16 for the MXU contraction (the reference's
    faiss path likewise drops to fp16 LUTs when M >= 56,
    evaluate_repconc.py:126,133). For repeated searches build a
    PallasADCIndex once instead.
    """
    index = PallasADCIndex(codes, centroids, chunk_size)
    return index.search(query_embeds, topk=topk, exact=exact)
