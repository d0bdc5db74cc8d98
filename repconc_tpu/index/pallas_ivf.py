"""Pallas cell-grouped IVF-PQ serving — batch search at TPU speed.

faiss's GPU IVFPQ walks posting lists per query; a TPU wants the dual
schedule: GROUP THE BATCH BY CELL. All (query, cell) probe pairs are sorted
by cell and padded into work tiles of QT_G query slots; each grid step DMAs
one cell's padded code block (scalar-prefetch-driven index: the work array
tells the pipeline WHICH cell block to fetch), builds the cell's one-hot
expansion once in VMEM, and scores all QT_G queries of the tile against it
on the MXU. The expensive part of PQ scanning — the one-hot/codes decode —
is thus shared across every query probing that cell.

Post-processing (pure XLA): every pair's score row is gathered back per
query (pairs were sorted stably, so each query's nprobe rows are recovered
by a second argsort), padding is masked, spill-segment brute-force results
are merged, and approx_max_k produces the final top-k.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from repconc_tpu.index.adc import build_lut
from repconc_tpu.index.ivf import IVFIndex, probe_cells
from repconc_tpu.index.pallas_adc import _group_size, permute_lut

QT_G = 32  # query slots per work tile (MXU row occupancy vs pair padding)


L_SUB = 512  # list sub-tile: bounds the VMEM one-hot regardless of Lpad


def _ivf_kernel(gm: int, K: int, work_ref, lut_ref, codes_ref, out_ref):
    """lut_ref: (QT_G, M*K) bf16; codes_ref: (1, Lpad, M) uint8 (one cell);
    out_ref: (1, QT_G, Lpad) f32. Sub-tiles the list dimension so the
    in-VMEM one-hot stays (L_SUB, gm*K) even for long posting lists."""
    Lpad, M = codes_ref.shape[1], codes_ref.shape[2]
    G = M // gm
    lanes = gm * K
    sub = min(L_SUB, Lpad)

    for s0 in range(0, Lpad, sub):
        codes = codes_ref[0, s0:s0 + sub, :].astype(jnp.int32)  # (sub, M)
        acc = jnp.zeros((out_ref.shape[1], sub), dtype=jnp.float32)
        for g in range(G):
            cols = codes[:, g * gm:(g + 1) * gm]
            expanded = pltpu.repeat(cols, K, axis=1)      # (sub, gm*K)
            k_of_lane = jax.lax.broadcasted_iota(
                jnp.int32, (sub, lanes), dimension=1) // gm
            onehot = (expanded == k_of_lane).astype(jnp.bfloat16)
            lut_g = lut_ref[:, g * lanes:(g + 1) * lanes]
            acc = acc + jax.lax.dot_general(
                lut_g, onehot,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, s0:s0 + sub] = acc


TILE_CHUNK = 512  # work tiles per lax.map step (bounds the LUT-row gather)


@functools.partial(jax.jit, static_argnames=("K",))
def _score_work_tiles(work_cell, qidx, lut_z, cell_codes_u8, K: int):
    """work_cell: (T,) int32; qidx: (T, QT_G) int32 slot->query map (row Q of
    lut_z is a zero row for empty slots); lut_z: (Q+1, MK) bf16;
    cell_codes_u8: (nlist, Lpad, M) uint8. Returns (T, QT_G, Lpad) f32.

    Work tiles are processed in TILE_CHUNK groups under lax.map so the
    gathered LUT-row array peaks at TILE_CHUNK*QT_G*MK bf16 (~400MB) instead
    of materializing all T*QT_G rows (~6GB at 8.8M-doc scale).
    """
    T = work_cell.shape[0]
    MK = lut_z.shape[1]
    nlist, Lpad, M = cell_codes_u8.shape
    gm = _group_size(M, K)
    kernel = functools.partial(_ivf_kernel, gm, K)

    tc = min(TILE_CHUNK, T)
    Tpad = ((T + tc - 1) // tc) * tc
    work_p = jnp.pad(work_cell, (0, Tpad - T))
    qidx_p = jnp.pad(qidx, ((0, Tpad - T), (0, 0)),
                     constant_values=lut_z.shape[0] - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((QT_G, MK), lambda t, work: (t, 0)),
            pl.BlockSpec((1, Lpad, M), lambda t, work: (work[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QT_G, Lpad), lambda t, work: (t, 0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tc, QT_G, Lpad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tc * QT_G * Lpad * MK,
            bytes_accessed=tc * (QT_G * MK * 2 + Lpad * M + QT_G * Lpad * 4),
            transcendentals=0,
        ),
    )

    def chunk_fn(args):
        wc, qi = args  # (tc,), (tc, QT_G)
        lut_rows = jnp.take(lut_z, qi.reshape(-1), axis=0)  # (tc*QT_G, MK)
        return call(wc, lut_rows, cell_codes_u8)

    out = jax.lax.map(chunk_fn, (work_p.reshape(-1, tc),
                                 qidx_p.reshape(-1, tc, QT_G)))
    return out.reshape(Tpad, QT_G, Lpad)[:T]


@functools.partial(jax.jit, static_argnames=("nprobe", "topk", "K", "T_max"))
def _ivf_search_device(
    query_embeds,       # (Q, D) f32
    pq_centroids,       # (M, K, dsub) f32
    coarse_centroids,   # (nlist, D) f32
    cell_codes_u8,      # (nlist, Lpad, M) uint8
    cell_ids,           # (nlist, Lpad) int32 (-1 pad)
    nprobe: int,
    topk: int,
    K: int,
    T_max: int,
):
    Q, D = query_embeds.shape
    nlist, Lpad, M = cell_codes_u8.shape
    gm = _group_size(M, K)

    # ---- probe + pair construction -------------------------------------
    cells = probe_cells(query_embeds, coarse_centroids, nprobe)  # (Q, nprobe)
    pair_cell = cells.reshape(-1)                                 # (P,)
    pair_q = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), nprobe)
    P = pair_cell.shape[0]

    order = jnp.argsort(pair_cell, stable=True)
    sc = jnp.take(pair_cell, order)           # sorted cells
    sq = jnp.take(pair_q, order)              # their queries

    # rank within cell, tile id, slot
    first_pos = jnp.searchsorted(sc, sc, side="left")
    rank = jnp.arange(P, dtype=jnp.int32) - first_pos.astype(jnp.int32)
    is_tile_start = (rank % QT_G) == 0
    work_id = jnp.cumsum(is_tile_start.astype(jnp.int32)) - 1  # (P,)
    slot = rank % QT_G
    row = work_id * QT_G + slot                                 # pair -> slot row

    work_cell = jnp.zeros((T_max,), dtype=jnp.int32)
    work_cell = work_cell.at[work_id].set(sc)                   # last write wins (same cell)

    # ---- tiny slot->query map; LUT rows are DMA'd inside the kernel ----
    lut = permute_lut(build_lut(query_embeds, pq_centroids), gm)  # (Q, MK) f32
    lut = lut.astype(jnp.bfloat16)
    MK = lut.shape[1]
    lut_z = jnp.concatenate([lut, jnp.zeros((1, MK), jnp.bfloat16)], axis=0)
    qidx = jnp.full((T_max * QT_G,), Q, dtype=jnp.int32).at[row].set(sq)
    qidx = qidx.reshape(T_max, QT_G)

    # ---- score all work tiles on the MXU --------------------------------
    scores = _score_work_tiles(work_cell, qidx, lut_z, cell_codes_u8, K)
    scores_flat = scores.reshape(T_max * QT_G, Lpad)

    # ---- regroup per query ----------------------------------------------
    # stable argsort of sq groups each query's nprobe pairs contiguously
    by_q = jnp.argsort(sq, stable=True)
    rows_per_query = jnp.take(row, by_q).reshape(Q, nprobe)
    cells_per_query = jnp.take(sc, by_q).reshape(Q, nprobe)

    cand_scores = jnp.take(scores_flat, rows_per_query.reshape(-1), axis=0)
    cand_scores = cand_scores.reshape(Q, nprobe * Lpad)
    cand_ids = jnp.take(cell_ids, cells_per_query.reshape(-1), axis=0)
    cand_ids = cand_ids.reshape(Q, nprobe * Lpad)
    cand_scores = jnp.where(cand_ids >= 0, cand_scores, -jnp.inf)

    k = min(topk, cand_scores.shape[1])
    s, pos = jax.lax.approx_max_k(cand_scores, k, recall_target=1.0)
    ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    return s, ids


class PallasIVFIndex:
    """Device-resident IVF-PQ index served by the cell-grouped kernel."""

    def __init__(self, index: IVFIndex):
        self.host = index
        self.K = index.centroids.shape[1]
        self.nlist = index.nlist
        self.cell_codes = jnp.asarray(index.cell_codes)  # uint8, 1 byte/code
        self.cell_ids = jnp.asarray(index.cell_ids)
        self.coarse = jnp.asarray(index.coarse_centroids)
        self.set_centroids(index.centroids)
        self.spill = None
        if len(index.spill_ids):
            from repconc_tpu.index.pallas_adc import PallasADCIndex

            self.spill = PallasADCIndex(index.spill_codes, index.centroids)
            self.spill_ids = index.spill_ids

    def set_centroids(self, centroids):
        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        if getattr(self, "spill", None) is not None:
            self.spill.set_centroids(centroids)

    def search_device(self, query_embeds, topk: int = 1000, nprobe: int = 64):
        q = jnp.asarray(query_embeds, dtype=jnp.float32)
        Q = q.shape[0]
        nprobe = min(nprobe, self.nlist)
        T_max = (Q * nprobe) // QT_G + self.nlist + 1
        s, i = _ivf_search_device(
            q, self.centroids, self.coarse, self.cell_codes, self.cell_ids,
            nprobe, topk, self.K, T_max)
        return s, i

    def search(self, query_embeds, topk: int = 1000, nprobe: int = 64):
        s, i = self.search_device(query_embeds, topk, nprobe)
        s, i = np.asarray(s), np.asarray(i)
        if self.spill is not None:
            s_sp, i_sp = self.spill.search(query_embeds,
                                           topk=min(topk, len(self.spill_ids)))
            ids_sp = self.spill_ids[i_sp]
            s = np.concatenate([s, s_sp], axis=1)
            i = np.concatenate([i, ids_sp], axis=1)
            order = np.argsort(-s, axis=1)[:, :topk]
            s = np.take_along_axis(s, order, axis=1)
            i = np.take_along_axis(i, order, axis=1)
        return s, i
