"""Pallas cell-grouped IVF-PQ serving — batch search at TPU speed.

Rebuilds the reference's deployed fast GPU scan — faiss IndexIVFPQ with
precomputed tables behind batch_search (evaluate_repconc.py:101-135,
:180-206) — as a TPU-native kernel, with a REAL inverted file where the
reference degenerates to nlist=1 (evaluate_repconc.py:104-110).

faiss's GPU IVFPQ walks posting lists per query; a TPU wants the dual
schedule: GROUP THE BATCH BY CELL. All (query, cell) probe pairs are
grouped by cell and padded into work tiles of QT_G query slots; each grid
step DMAs cell code blocks, builds each cell's one-hot expansion once in
VMEM, and scores all QT_G queries of the tile against it on the MXU. The
expensive part of PQ scanning — the one-hot/codes decode — is thus shared
across every query probing that cell.

The cell-grouping itself is SORT-FREE: a 77k-pair argsort lowers to a
~13 ms bitonic sort on TPU, but cells within one query are distinct, so a
pair's stable rank inside its cell is an exclusive cumsum over the
(Q, nlist) 0/1 incidence matrix, and tile offsets follow from per-cell
counts — a scatter + cumsum + gathers, ~10x cheaper. A second consequence:
pair->slot assignments stay in q-major order, so regrouping scores per
query is a reshape, not a permutation.

Post-processing (pure XLA): every pair's score row is gathered back per
query, padding is masked, spill-segment brute-force results are merged,
and approx_max_k produces the final top-k.

A negative result worth keeping (round 2, measured on v5e): ~35% of the
static work-tile grid is padding at serving shapes (T_max assumes every
probed cell ends in a partial tile), but skipping those tiles in-kernel via
an SMEM occupied-count + pl.when REGRESSED throughput 5-8% — Mosaic's block
pipeline fetches every grid step's blocks regardless, so predication saves
only VPU work while disrupting double-buffering. The kernel is
pipeline/DMA-bound, not one-hot-compute-bound, at these shapes.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from repconc_tpu.index.adc import build_lut
from repconc_tpu.index.ivf import IVFIndex, probe_cells
from repconc_tpu.index.pallas_adc import (_build_onehot,
                                          _group_size, _interpret,
                                          permute_lut, quantize_lut_int8)

# Kernel geometry. Env-overridable for offline sweeps
# (recipes/bench_kernel_sweep.py) — the defaults are the round-2 tuned
# values; R_TILES=3 and TILE_CHUNK=1024 were measured WORSE (see module
# docstring / RESULTS.md), QT_G is the remaining untested lever.
QT_G = int(os.environ.get("REPCONC_IVF_QT_G", "32"))
#            query slots per work tile (MXU row occupancy vs pair padding)

L_SUB = 512  # list sub-tile: bounds the VMEM one-hot regardless of Lpad


R_TILES = int(os.environ.get("REPCONC_IVF_R_TILES", "2"))
#            work tiles per grid step (fewer, fatter steps amortize per-step
#            overhead; bounded by VMEM: onehot scratch + R*QT_G LUT rows)


def _tile_geometry(Lpad: int) -> tuple[int, int]:
    """(tiles per grid step, one-hot scratch rows). For long posting lists
    (Lpad > L_SUB, e.g. the 8.8M-doc nlist=5000 Lpad=2048 layout) the
    scratch shrinks to 256 rows: at M*K=12288 lanes a 512-row bf16 scratch
    is 12.6 MB, and with the one-hot build's (sub, gm*K) iota/compare temps
    plus double-buffered LUT/codes/out blocks the scoped-VMEM budget
    (~16 MB) overflows — measured, not theoretical: (r=1, sub=512) is
    rejected by Mosaic at 16.7 MB. sub must DIVIDE Lpad: Mosaic's compiler
    crashes (Check failed: limits[i] <= dim(i), measured on v5e) on the
    short final sub-slice a remainder would need, so for long lists sub is
    the largest of 256/128 dividing Lpad (build_ivf pads to a multiple of
    128, so 128 always divides)."""
    if Lpad <= L_SUB:
        return R_TILES, min(L_SUB, Lpad)
    if Lpad % 128 != 0:
        raise ValueError(
            f"Lpad={Lpad} > {L_SUB} must be a multiple of 128: the Mosaic "
            "compiler crashes on the short final sub-slice a remainder needs "
            "(build_ivf pads to a multiple of 128; pad hand-built indexes)")
    return R_TILES, 256 if Lpad % 256 == 0 else 128


def _ivf_kernel(gm: int, K: int, lut_ref, codes_ref, out_ref, onehot_ref):
    """lut_ref: (R*QT_G, M*K) bf16; codes_ref: (R, Lpad, M) uint8 (R cells,
    pre-gathered tile-major on the XLA side); out_ref: (R, QT_G, Lpad) f32;
    onehot_ref: (L_SUB, M*K) bf16 scratch. Each cell's one-hot expansion is
    built once on the VPU and contracted against its tile's QT_G LUT rows on
    the MXU; the list dimension is sub-tiled so scratch stays (L_SUB, M*K)
    for any Lpad."""
    R, Lpad, M = codes_ref.shape
    sub = _tile_geometry(Lpad)[1]
    for r in range(R):
        for s0 in range(0, Lpad, sub):
            # sub | Lpad guaranteed by _tile_geometry (Mosaic crashes on
            # short final sub-slices — it raises there instead); one-hot
            # expansion shared with the brute kernel (_build_onehot)
            _build_onehot(gm, K, codes_ref[r, s0:s0 + sub, :], onehot_ref)
            out_ref[r, :, s0:s0 + sub] = jax.lax.dot_general(
                lut_ref[r * QT_G:(r + 1) * QT_G, :], onehot_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _ivf_kernel_i8(gm: int, K: int, lut_ref, scale_ref, codes_ref, out_ref,
                   onehot_ref):
    """int8-LUT variant of _ivf_kernel: lut_ref (R*QT_G, M*K) int8 quantized
    per (query, group) with scale_ref (R*QT_G, G) f32 (quantize_lut_int8);
    onehot scratch is int8 so every contraction runs the MXU s8xs8->s32
    path; per-group partial sums are rescaled by the group's dequantization
    factor. Halves the LUT-row gather/DMA bytes — the dominant serving
    traffic — for <=scale/2 per-term score error (~1% top-100 churn,
    tests/test_pallas_adc.py). The reference's deployed faiss index uses
    fp16 LUTs above M=56 (evaluate_repconc.py:126); this is the TPU analog
    one step further."""
    R, Lpad, M = codes_ref.shape
    G = M // gm
    lanes = gm * K
    sub = _tile_geometry(Lpad)[1]
    for r in range(R):
        lut_r = lut_ref[r * QT_G:(r + 1) * QT_G, :]
        scale_r = scale_ref[r * QT_G:(r + 1) * QT_G, :]
        for s0 in range(0, Lpad, sub):
            # sub | Lpad guaranteed by _tile_geometry; shared one-hot build
            _build_onehot(gm, K, codes_ref[r, s0:s0 + sub, :], onehot_ref)
            acc = jnp.zeros((QT_G, sub), dtype=jnp.float32)
            for g in range(G):
                part = jax.lax.dot_general(
                    lut_r[:, g * lanes:(g + 1) * lanes],
                    onehot_ref[:, g * lanes:(g + 1) * lanes],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = acc + part.astype(jnp.float32) * scale_r[:, g:g + 1]
            out_ref[r, :, s0:s0 + sub] = acc


TILE_CHUNK = int(os.environ.get("REPCONC_IVF_TILE_CHUNK", "512"))
#            work tiles per lax.map step (bounds the LUT-row gather)


@functools.partial(jax.jit, static_argnames=("K",))
def _score_work_tiles(work_cell, qidx, lut_z, cell_codes_u8, K: int,
                      scales_z=None):
    """work_cell: (T,) int32; qidx: (T, QT_G) int32 slot->query map (row Q of
    lut_z is a zero row for empty slots); lut_z: (Q+1, MK) bf16 — or int8
    with scales_z (Q+1, G) f32 for the quantized-LUT path;
    cell_codes_u8: (nlist, Lpad, M) uint8. Returns (T, QT_G, Lpad) f32.

    The tiles' cell code blocks are pre-gathered tile-major (a cheap row
    gather: codes are M bytes/doc), so the kernel's block pipeline is fully
    sequential — no scalar-prefetch indexed DMA — and R_TILES tiles are
    processed per grid step to amortize per-step overhead. Work tiles are
    processed in TILE_CHUNK groups under lax.map so the gathered LUT-row
    array peaks at TILE_CHUNK*QT_G*MK bf16 (~400MB) instead of materializing
    all T*QT_G rows (~6GB at 8.8M-doc scale).
    """
    T = work_cell.shape[0]
    MK = lut_z.shape[1]
    nlist, Lpad, M = cell_codes_u8.shape
    gm = _group_size(M, K)
    int8_path = scales_z is not None

    r_tiles, sub = _tile_geometry(Lpad)
    # tc MUST be a multiple of r_tiles: grid=(tc // r_tiles,) floor-divides,
    # and a remainder would leave the last tiles of every chunk unscored
    # (uninitialized output gathered into candidates with overflow=0)
    tcap = max(r_tiles, (TILE_CHUNK // r_tiles) * r_tiles)
    tc = min(tcap, ((T + r_tiles - 1) // r_tiles) * r_tiles)
    Tpad = ((T + tc - 1) // tc) * tc
    work_p = jnp.pad(work_cell, (0, Tpad - T))
    qidx_p = jnp.pad(qidx, ((0, Tpad - T), (0, 0)),
                     constant_values=lut_z.shape[0] - 1)

    lut_spec = pl.BlockSpec((r_tiles * QT_G, MK), lambda t: (t, 0))
    codes_spec = pl.BlockSpec((r_tiles, Lpad, M), lambda t: (t, 0, 0))
    if int8_path:
        G = M // gm
        kernel = functools.partial(_ivf_kernel_i8, gm, K)
        in_specs = [lut_spec,
                    pl.BlockSpec((r_tiles * QT_G, G), lambda t: (t, 0)),
                    codes_spec]
        scratch_dtype = jnp.int8
        lut_bytes = 1
    else:
        kernel = functools.partial(_ivf_kernel, gm, K)
        in_specs = [lut_spec, codes_spec]
        scratch_dtype = jnp.bfloat16
        lut_bytes = 2

    call = pl.pallas_call(
        kernel,
        grid=(tc // r_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_tiles, QT_G, Lpad), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((tc, QT_G, Lpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((sub, MK), scratch_dtype)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * tc * QT_G * Lpad * MK,
            bytes_accessed=tc * (QT_G * MK * lut_bytes + Lpad * M
                                 + QT_G * Lpad * 4),
            transcendentals=0,
        ),
    )

    def chunk_fn(args):
        wc, qi = args  # (tc,), (tc, QT_G)
        lut_rows = jnp.take(lut_z, qi.reshape(-1), axis=0)  # (tc*QT_G, MK)
        tile_codes = jnp.take(cell_codes_u8, wc, axis=0)    # (tc, Lpad, M)
        if int8_path:
            scale_rows = jnp.take(scales_z, qi.reshape(-1), axis=0)
            return call(lut_rows, scale_rows, tile_codes)
        return call(lut_rows, tile_codes)

    out = jax.lax.map(chunk_fn, (work_p.reshape(-1, tc),
                                 qidx_p.reshape(-1, tc, QT_G)))
    return out.reshape(Tpad, QT_G, Lpad)[:T]


def _merge_spill(s, i, spill, spill_ids, query_embeds, topk: int):
    """Brute-force the spill segment and merge into the IVF top-k (shared by
    the single-chip and sharded index classes)."""
    if spill is None:
        return s, i
    s_sp, i_sp = spill.search(query_embeds, topk=min(topk, len(spill_ids)))
    ids_sp = spill_ids[i_sp]
    s = np.concatenate([s, s_sp], axis=1)
    i = np.concatenate([i, ids_sp], axis=1)
    order = np.argsort(-s, axis=1)[:, :topk]
    return (np.take_along_axis(s, order, axis=1),
            np.take_along_axis(i, order, axis=1))


def _tile_budget(Q: int, nprobe: int, nlist: int,
                 capacity_factor: float) -> int:
    """Static work-tile budget: expected occupied tiles under a uniform
    multinomial probe mix (Poisson approximation), padded by
    capacity_factor, clamped to the adversarial worst case.

    The worst case (every probed cell ends in a partial tile) is ~55% loose
    at serving shapes: at Q=1200 nprobe=64 nlist=4096 it allows 6,497 tiles
    while measured loads occupy ~4,100-4,800 — and the tile count drives
    BOTH the LUT-row gather bytes and the kernel grid. The probe rule's
    centroid-norm penalty (probe_cells: q.c - ||c||^2/2) spreads loads
    ~15% wider than the uniform-multinomial estimate (measured on random
    data), hence the 1.35 default factor; any residual adversarial spread
    is caught dynamically (occupied count returned by the search) and
    retried at the worst-case shape."""
    P = Q * nprobe
    t_worst = P // QT_G + nlist + 1
    lam = P / nlist
    jmax = int(lam + 10.0 * lam ** 0.5 + 10)
    j = np.arange(1, jmax + 1, dtype=np.float64)
    log_pmf = -lam + j * np.log(lam) - np.cumsum(np.log(j))
    e_ceil = float(np.sum(np.exp(log_pmf) * np.ceil(j / QT_G)))
    t_est = nlist * e_ceil
    return min(t_worst, int(capacity_factor * t_est) + 8)


def _group_pairs(cells, Q: int, nlist: int, nprobe: int, T_max: int):
    """Sort-free grouping of the (query, cell) probe pairs into work tiles.

    Grouping P = Q*nprobe pairs by cell does NOT need the 77k-element
    argsort (its bitonic lowering costs ~13 ms at serving shapes): cells
    within one query are DISTINCT (probe_cells = top-k positions), so a
    pair's stable rank inside its cell is "how many earlier queries
    probed this cell" — an exclusive cumsum over the (Q, nlist) 0/1
    incidence matrix (19 MB at serving shapes, two orders of magnitude
    cheaper than the sort). Tile layout (cell-ascending, query-stable
    within cell) is identical to what the stable sort produced.

    Returns (pair_q, row, work_cell, qidx, overflow):
      row (P,) — each pair's slot row (work_id * QT_G + slot), q-major;
      work_cell (T_max,) — tile -> cell id;
      qidx (T_max, QT_G) — slot -> query id, Q for empty slots (callers
      append a zero row at index Q of whatever per-query table they DMA);
      overflow — count of pairs whose tile fell past the T_max budget
      (their scatters drop OOB; candidates are masked by the caller).
    """
    pair_cell = cells.reshape(-1)                                 # (P,)
    pair_q = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), nprobe)

    incidence = jnp.zeros((Q, nlist), jnp.int32).at[
        pair_q, pair_cell].set(1)
    counts = jnp.sum(incidence, axis=0)                          # (nlist,)
    rank = jnp.take((jnp.cumsum(incidence, axis=0) - incidence).reshape(-1),
                    pair_q * nlist + pair_cell)                  # (P,)

    tiles_per_cell = -(-counts // QT_G)                          # ceil
    tiles_before = jnp.cumsum(tiles_per_cell) - tiles_per_cell
    # pairs in tiles past T_max (possible when T_max is a capacity budget,
    # not the worst case): their scatters drop (OOB), their candidate rows
    # are masked by the caller, and the overflow count says to retry.
    # Unit: dropped PAIRS (same unit as ShardedPallasIVFIndex's overflow).
    work_id = jnp.take(tiles_before, pair_cell) + rank // QT_G   # (P,)
    overflow = jnp.sum((work_id >= T_max).astype(jnp.int32))
    slot = rank % QT_G
    row = work_id * QT_G + slot                                  # pair -> slot row

    work_cell = jnp.zeros((T_max,), dtype=jnp.int32)
    work_cell = work_cell.at[work_id].set(pair_cell)            # last write wins (same cell)
    qidx = jnp.full((T_max * QT_G,), Q, dtype=jnp.int32).at[row].set(pair_q)
    return pair_q, row, work_cell, qidx.reshape(T_max, QT_G), overflow


def _regroup_topk(scores_flat, row, cells, cell_ids, T_max: int, Q: int,
                  nprobe: int, topk: int):
    """Gather each query's candidate rows, mask padding, exact top-k.

    row was computed in q-major pair order, so the regroup is a reshape."""
    Lpad = cell_ids.shape[1]
    rows_per_query = row.reshape(Q, nprobe)

    row_ok = rows_per_query < T_max * QT_G                      # (Q, nprobe)
    cand_scores = jnp.take(
        scores_flat,
        jnp.clip(rows_per_query, 0, T_max * QT_G - 1).reshape(-1), axis=0)
    cand_scores = cand_scores.reshape(Q, nprobe, Lpad)
    cand_scores = jnp.where(row_ok[:, :, None], cand_scores, -jnp.inf)
    cand_scores = cand_scores.reshape(Q, nprobe * Lpad)
    cand_ids = jnp.take(cell_ids, cells.reshape(-1), axis=0)
    cand_ids = cand_ids.reshape(Q, nprobe * Lpad)
    cand_scores = jnp.where(cand_ids >= 0, cand_scores, -jnp.inf)

    k = min(topk, cand_scores.shape[1])
    s, pos = jax.lax.approx_max_k(cand_scores, k, recall_target=1.0)
    ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    return s, ids


@functools.partial(jax.jit, static_argnames=("nprobe", "topk", "K", "T_max",
                                              "lut_dtype"))
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
    lut_dtype: str = "bf16",
):
    Q, D = query_embeds.shape
    nlist, Lpad, M = cell_codes_u8.shape
    gm = _group_size(M, K)

    # ---- probe + pair construction (sort-free; see _group_pairs) --------
    cells = probe_cells(query_embeds, coarse_centroids, nprobe)  # (Q, nprobe)
    pair_q, row, work_cell, qidx, overflow = _group_pairs(
        cells, Q, nlist, nprobe, T_max)

    # ---- tiny slot->query map; LUT rows are DMA'd inside the kernel ----
    lut = permute_lut(build_lut(query_embeds, pq_centroids), gm)  # (Q, MK) f32
    MK = lut.shape[1]
    if lut_dtype == "int8":
        lut_i8, scales = quantize_lut_int8(lut, gm, K)
        lut_z = jnp.concatenate(
            [lut_i8, jnp.zeros((1, MK), jnp.int8)], axis=0)
        scales_z = jnp.concatenate(
            [scales, jnp.zeros((1, scales.shape[1]), jnp.float32)], axis=0)
    else:
        lut_z = jnp.concatenate(
            [lut.astype(jnp.bfloat16), jnp.zeros((1, MK), jnp.bfloat16)],
            axis=0)
        scales_z = None

    # ---- score all work tiles on the MXU --------------------------------
    scores = _score_work_tiles(work_cell, qidx, lut_z, cell_codes_u8, K,
                               scales_z=scales_z)
    scores_flat = scores.reshape(T_max * QT_G, Lpad)

    # ---- regroup per query + exact top-k ---------------------------------
    s, ids = _regroup_topk(scores_flat, row, cells, cell_ids, T_max, Q,
                           nprobe, topk)
    return s, ids, overflow


@functools.partial(jax.jit, static_argnames=("chunk",))
def decode_cells(cell_codes_u8, pq_centroids, chunk: int = 64):
    """Reconstruct every cell's documents: (nlist, Lpad, M) u8 -> (nlist,
    Lpad, D) bf16, lax.map-chunked over cells so the intermediate stays
    ~chunk*Lpad*D f32. Built once at serving-enable time (decoded
    residency); bf16 storage is the same precision class as the ADC
    kernel's bf16 LUT."""
    from repconc_tpu.quant.codebook import decode_gather

    nlist, Lpad, M = cell_codes_u8.shape
    npad = ((nlist + chunk - 1) // chunk) * chunk
    codes_p = jnp.pad(cell_codes_u8, ((0, npad - nlist), (0, 0), (0, 0)))

    def dec(codes_c):  # (chunk, Lpad, M)
        flat = decode_gather(codes_c.reshape(chunk * Lpad, M), pq_centroids)
        return flat.reshape(chunk, Lpad, -1).astype(jnp.bfloat16)

    out = jax.lax.map(dec, codes_p.reshape(npad // chunk, chunk, Lpad, M))
    return out.reshape(npad, Lpad, -1)[:nlist]


@functools.partial(jax.jit, static_argnames=("chunk",))
def decode_cells_int8(cell_codes_u8, pq_centroids, chunk: int = 64):
    """int8 decoded residency: (nlist, Lpad, D) int8 + a per-DIM doc scale.

    Per-dim scales cannot be factored out of an integer dot product on the
    doc side — but they CAN be folded into the QUERY: with x8_d =
    round(x_d / s_d) and q'_d = q_d * s_d quantized per query at scale sq,
    sum_d q_d x_d ~= sq * sum_d q8_d x8_d exactly factorizes, so the whole
    tile scores on the MXU s8 x s8 -> s32 path (2x bf16 throughput on
    v5e) and the store is D bytes/doc — 7.9 GB at MS MARCO's 8.8M docs,
    which FITS one chip where bf16 residency (15.7 GB) does not.

    s_d = max_cell |x̂_d| / 127 over the reconstruction table itself (the
    decode is from a finite codebook, so the max is exact, not sampled)."""
    from repconc_tpu.quant.codebook import decode_gather

    nlist, Lpad, M = cell_codes_u8.shape
    npad = ((nlist + chunk - 1) // chunk) * chunk
    codes_p = jnp.pad(cell_codes_u8, ((0, npad - nlist), (0, 0), (0, 0)))
    codes_c = codes_p.reshape(npad // chunk, chunk, Lpad, M)

    # exact per-dim bound from the codebook: |x̂_d| <= max_k |C[m, k, d']|
    D = pq_centroids.shape[0] * pq_centroids.shape[2]
    bound = jnp.max(jnp.abs(pq_centroids), axis=1).reshape(D)   # (D,)
    scale = jnp.maximum(bound, 1e-12) / 127.0

    def dec(codes_chunk):  # (chunk, Lpad, M)
        flat = decode_gather(codes_chunk.reshape(chunk * Lpad, M),
                             pq_centroids)
        q = jnp.clip(jnp.round(flat / scale), -127, 127).astype(jnp.int8)
        return q.reshape(chunk, Lpad, D)

    out = jax.lax.map(dec, codes_c)
    return out.reshape(npad, Lpad, D)[:nlist], scale


def _score_work_tiles_decoded_int8(work_cell, qidx, q8_z, qscale_z,
                                   cell_vecs_i8):
    """int8 decoded scorer: MXU s8 x s8 -> s32, rescaled per query row.

    q8_z: (Q+1, D) int8 scale-folded quantized queries (row Q zeros);
    qscale_z: (Q+1,) f32 per-query scales. Returns (T, QT_G, Lpad) f32."""
    T = work_cell.shape[0]
    tc = min(TILE_CHUNK, T)
    Tpad = ((T + tc - 1) // tc) * tc
    work_p = jnp.pad(work_cell, (0, Tpad - T))
    qidx_p = jnp.pad(qidx, ((0, Tpad - T), (0, 0)),
                     constant_values=q8_z.shape[0] - 1)

    def chunk_fn(args):
        wc, qi = args
        q_rows = jnp.take(q8_z, qi.reshape(-1), axis=0)      # (tc*QT_G, D) i8
        q_rows = q_rows.reshape(tc, QT_G, -1)
        srows = jnp.take(qscale_z, qi.reshape(-1), axis=0)   # (tc*QT_G,) f32
        tile_vecs = jnp.take(cell_vecs_i8, wc, axis=0)       # (tc, Lpad, D)
        acc = jax.lax.dot_general(
            q_rows, tile_vecs,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                # (tc, QT_G, Lpad)
        return acc.astype(jnp.float32) * srows.reshape(tc, QT_G, 1)

    out = jax.lax.map(chunk_fn, (work_p.reshape(-1, tc),
                                 qidx_p.reshape(-1, tc, QT_G)))
    return out.reshape(Tpad, QT_G, -1)[:T]


def _score_work_tiles_decoded(work_cell, qidx, q_z, cell_vecs):
    """Decoded-residency scorer: one fat MXU matmul per work tile.

    q_z: (Q+1, D) bf16 (row Q is zeros for empty slots); cell_vecs:
    (nlist, Lpad, D) bf16 reconstructions. Returns (T, QT_G, Lpad) f32.

    ADC's score sum_m LUT[q, m, code] IS dot(q, reconstruction) — the LUT
    indirection exists to avoid multiplies on hardware where gather is
    cheaper than FLOPs. On the MXU that trade inverts: gathering LUT rows
    costs more DMA than the multiplies it saves, and the per-cell one-hot
    decode (the measured VPU floor of the ADC kernel, RESULTS.md round 2)
    disappears entirely when the reconstructions are HBM-resident. Per
    tile: (QT_G, D) query rows x (Lpad, D)^T cell block — contraction dim
    D=768 keeps the systolic array fat. Pure XLA (batched dot_general);
    no Pallas needed, so this path also runs anywhere XLA does.

    The memory trade is explicit: bf16 reconstructions are D*2 bytes/doc
    (1.6 GB at 1M docs, D=768) vs M bytes/doc for codes (48 MB) — PQ still
    wins storage; this wins serving speed when HBM has room.
    """
    T = work_cell.shape[0]
    tc = min(TILE_CHUNK, T)
    Tpad = ((T + tc - 1) // tc) * tc
    work_p = jnp.pad(work_cell, (0, Tpad - T))
    qidx_p = jnp.pad(qidx, ((0, Tpad - T), (0, 0)),
                     constant_values=q_z.shape[0] - 1)

    def chunk_fn(args):
        wc, qi = args                                    # (tc,), (tc, QT_G)
        q_rows = jnp.take(q_z, qi.reshape(-1), axis=0)   # (tc*QT_G, D) bf16
        q_rows = q_rows.reshape(tc, QT_G, -1)
        tile_vecs = jnp.take(cell_vecs, wc, axis=0)      # (tc, Lpad, D) bf16
        return jax.lax.dot_general(
            q_rows, tile_vecs,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (tc, QT_G, Lpad)

    out = jax.lax.map(chunk_fn, (work_p.reshape(-1, tc),
                                 qidx_p.reshape(-1, tc, QT_G)))
    return out.reshape(Tpad, QT_G, -1)[:T]


@functools.partial(jax.jit, static_argnames=("nprobe", "topk", "T_max"))
def _ivf_search_device_decoded(
    query_embeds,       # (Q, D) f32
    coarse_centroids,   # (nlist, D) f32
    cell_vecs,          # (nlist, Lpad, D) bf16 or int8 reconstructions
    cell_ids,           # (nlist, Lpad) int32 (-1 pad)
    nprobe: int,
    topk: int,
    T_max: int,
    doc_scale=None,     # (D,) f32 — required with int8 cell_vecs
):
    """IVF search over the decoded-residency store. Identical probe, pair
    grouping, masking, and top-k semantics to _ivf_search_device; only the
    scoring stage differs (see _score_work_tiles_decoded / _int8)."""
    Q, D = query_embeds.shape
    nlist, Lpad, _ = cell_vecs.shape

    cells = probe_cells(query_embeds, coarse_centroids, nprobe)
    pair_q, row, work_cell, qidx, overflow = _group_pairs(
        cells, Q, nlist, nprobe, T_max)

    if cell_vecs.dtype == jnp.int8:
        # fold the per-dim doc scale into the query, quantize per query
        q_f = query_embeds * doc_scale[None, :]
        qscale = jnp.maximum(jnp.max(jnp.abs(q_f), axis=1), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(q_f / qscale[:, None]),
                      -127, 127).astype(jnp.int8)
        q8_z = jnp.concatenate([q8, jnp.zeros((1, D), jnp.int8)], axis=0)
        qscale_z = jnp.concatenate([qscale, jnp.zeros((1,), jnp.float32)])
        scores = _score_work_tiles_decoded_int8(work_cell, qidx, q8_z,
                                                qscale_z, cell_vecs)
    else:
        q_z = jnp.concatenate(
            [query_embeds.astype(jnp.bfloat16),
             jnp.zeros((1, D), jnp.bfloat16)], axis=0)
        scores = _score_work_tiles_decoded(work_cell, qidx, q_z, cell_vecs)
    scores_flat = scores.reshape(T_max * QT_G, Lpad)

    s, ids = _regroup_topk(scores_flat, row, cells, cell_ids, T_max, Q,
                           nprobe, topk)
    return s, ids, overflow


class ShardedPallasIVFIndex:
    """IVF-PQ index with CELLS sharded round-robin over a device mesh.

    The reference replicates its GPU index on every device
    (evaluate_repconc.py:121-135, GpuMultipleClonerOptions(shard=False));
    here device d owns the cells {c : c % W == d}, so index memory scales
    1/W. Each device builds work tiles for its OWN (query, cell) pairs,
    scores them with the cell-grouped kernel, takes a local top-k over its
    candidates, and one all_gather + re-top-k merges — every pair is scored
    by exactly one device, so the merge is exact.

    SPMD static shapes force a per-device tile CAPACITY (like MoE expert
    capacity): T_cap = ceil(P/(W*QT_G) * capacity_factor) + nlist_local + 1.
    Round-robin ownership makes per-device pair counts Binomial(P, 1/W)
    (relative sigma ~1% at P=77k, W=8), so the default 1.5x factor leaves
    overflow probability negligible; the search additionally RETURNS the
    overflow count so callers can detect and retry with a larger factor —
    overflowed pairs are dropped from scoring, never silently mis-scored.
    """

    def __init__(self, mesh, index: IVFIndex, capacity_factor: float = 1.5):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        # cells are sharded over axis 0 ONLY: on a multi-axis mesh,
        # mesh.size would make the modulo-ownership partition leave cells
        # with c % W >= shape[axis0] owned by NO device (silently dropped)
        W = mesh.shape[self.axis]
        self.capacity_factor = capacity_factor
        self.K = index.centroids.shape[1]
        nlist, Lpad, M = index.cell_codes.shape
        self.nlist = nlist
        self.nlist_local = -(-nlist // W)
        npad = self.nlist_local * W

        # round-robin permutation: new row (c % W) * nlist_local + c // W
        codes_p = np.zeros((npad, Lpad, M), dtype=np.uint8)
        ids_p = np.full((npad, Lpad), -1, dtype=np.int32)
        c = np.arange(nlist)
        dest = (c % W) * self.nlist_local + c // W
        codes_p[dest] = index.cell_codes
        ids_p[dest] = index.cell_ids

        shard = NamedSharding(mesh, P(self.axis))
        repl = NamedSharding(mesh, P())
        self.cell_codes = jax.device_put(jnp.asarray(codes_p), shard)
        self.cell_ids = jax.device_put(jnp.asarray(ids_p), shard)
        self.coarse = jax.device_put(
            jnp.asarray(index.coarse_centroids), repl)
        self._repl = repl
        self._shard = shard
        self._fn_cache = {}  # (Q, topk, nprobe, T_cap, ...) -> jitted fn
        self.cell_vecs = None
        self.doc_scale = None
        self.serving = "adc"
        self.set_centroids(index.centroids)
        self.spill = None
        if len(index.spill_ids):
            from repconc_tpu.index.pallas_adc import PallasADCIndex

            self.spill = PallasADCIndex(index.spill_codes, index.centroids)
            self.spill_ids = index.spill_ids

    def _decoded_store(self, dtype: str):
        """Materialize (or reuse) the cell-sharded decoded store WITHOUT
        touching the default serving mode (ADVICE r4 #2; same single-store
        semantics as PallasIVFIndex._decoded_store — alternating dtypes
        rebuilds on each switch). Decode runs under shard_map so no
        reconstruction ever crosses the mesh: each device decodes and holds
        only ITS cells' reconstructions (D*{1,2}/W bytes/doc per device —
        2 GB/device for 8.8M docs bf16 on 8 devices)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        want = jnp.int8 if dtype == "int8" else jnp.bfloat16
        if self.cell_vecs is not None and self.cell_vecs.dtype == want:
            return self.cell_vecs, self.doc_scale
        if dtype == "int8":
            dec = jax.jit(shard_map(
                lambda c, pq: decode_cells_int8(c, pq)[0], mesh=self.mesh,
                in_specs=(P(self.axis), P()), out_specs=P(self.axis)))
            self.cell_vecs = dec(self.cell_codes, self.centroids)
            # per-dim scale comes from the replicated codebook: identical
            # on every device, so compute it once outside the mesh
            D = self.centroids.shape[0] * self.centroids.shape[2]
            bound = jnp.max(jnp.abs(self.centroids), axis=1).reshape(D)
            self.doc_scale = jax.device_put(
                jnp.maximum(bound, 1e-12) / 127.0, self._repl)
        else:
            dec = jax.jit(shard_map(
                decode_cells, mesh=self.mesh,
                in_specs=(P(self.axis), P()), out_specs=P(self.axis)))
            self.cell_vecs = dec(self.cell_codes, self.centroids)
            self.doc_scale = None
        return self.cell_vecs, self.doc_scale

    def enable_decoded_serving(self, dtype: str = "bf16"):
        """Materialize the cell-sharded decoded store and make decoded
        residency the DEFAULT serving mode (the only mutation point besides
        the constructor; per-call serving= overrides leave it untouched)."""
        self._decoded_store(dtype)
        self.serving = "decoded_int8" if dtype == "int8" else "decoded"
        return self

    def set_centroids(self, centroids):
        centroids = jnp.asarray(centroids, dtype=jnp.float32)
        if (getattr(self, "centroids", None) is not None
                and centroids.shape != self.centroids.shape):
            # cached search fns bake K/gm (static LUT width, kernel group
            # permutation) at build time — a codebook of a different shape
            # would be scored with stale geometry
            self._fn_cache.clear()
            self.K = centroids.shape[1]
        self.centroids = jax.device_put(centroids, self._repl)
        if getattr(self, "spill", None) is not None:
            self.spill.set_centroids(centroids)
        if getattr(self, "cell_vecs", None) is not None:
            # decoded residency bakes the codebook: drop the stale store on
            # swap; rebuild eagerly only when decoded is the DEFAULT mode
            self.cell_vecs, self.doc_scale = None, None
            if self.serving in ("decoded", "decoded_int8"):
                self._decoded_store(
                    "int8" if self.serving == "decoded_int8" else "bf16")

    def search_device(self, query_embeds, topk: int = 1000, nprobe: int = 64,
                      capacity_factor: float | None = -1.0,
                      lut_dtype: str = "bf16", serving: str | None = None):
        """capacity_factor: -1.0 (default) uses the constructor's factor;
        None sizes the per-device tile grid for the ADVERSARIAL worst case
        (every pair owned by one device) — no overflow possible. Returned
        overflow is a device int32 counting dropped PAIRS (same unit as the
        single-chip path); search() retries at the worst-case shape when it
        is positive. lut_dtype="int8" serves with per-(query, group)
        quantized LUTs exactly like the single-chip path (quantization is
        deterministic per query, so every device scores with identical
        tables and the merge semantics are unchanged).

        serving "decoded"/"decoded_int8" scores each device's tiles from
        its shard of the decoded-residency store (enable_decoded_serving);
        merge semantics are identical."""
        q = jnp.asarray(query_embeds, dtype=jnp.float32)
        Q = q.shape[0]
        nprobe = min(nprobe, self.nlist)
        W = self.mesh.shape[self.axis]
        P_pairs = Q * nprobe
        if capacity_factor == -1.0:
            capacity_factor = self.capacity_factor
        if capacity_factor is None:
            T_cap = P_pairs // QT_G + self.nlist_local + 1
        else:
            T_cap = (int(P_pairs * capacity_factor) // (W * QT_G)
                     + self.nlist_local + 1)
        mode = serving or self.serving
        if mode in ("decoded", "decoded_int8"):
            vecs, scale = self._decoded_store(
                "int8" if mode == "decoded_int8" else "bf16")
        key = (Q, topk, nprobe, T_cap, lut_dtype, mode)
        fn = self._fn_cache.get(key)
        if fn is None:  # one jit wrapper per config: a fresh wrapper per
            #             call would recompile every serving batch
            fn = self._build_search_fn(Q, topk, nprobe, T_cap, lut_dtype,
                                       mode)
            self._fn_cache[key] = fn
        if mode in ("decoded", "decoded_int8"):
            args = ((q, self.coarse, vecs, self.cell_ids, scale)
                    if mode == "decoded_int8" else
                    (q, self.coarse, vecs, self.cell_ids))
            s, ids, overflow = fn(*args)
        else:
            s, ids, overflow = fn(q, self.coarse, self.centroids,
                                  self.cell_codes, self.cell_ids)
        return s, ids, overflow

    def _build_search_fn(self, Q: int, topk: int, nprobe: int, T_cap: int,
                         lut_dtype: str = "bf16", serving: str = "adc"):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        W = self.mesh.shape[self.axis]
        axis, nlist_local, K = self.axis, self.nlist_local, self.K
        gm = _group_size(self.cell_codes.shape[2], K)

        def group_local(q, coarse):
            """Per-device tile construction over OWNED pairs.

            Sort-free grouping by local cell (see _ivf_search_device):
            cells within a query are distinct, so a pair's stable rank in
            its cell is the count of earlier queries probing it —
            incidence cumsum, not an argsort. Non-owned pairs contribute 0
            (masked .add) and are dropped."""
            d = jax.lax.axis_index(axis)
            cells = probe_cells(q, coarse, nprobe)          # GLOBAL cell ids
            pair_cell = cells.reshape(-1)
            pair_q = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), nprobe)
            owned = (pair_cell % W) == d
            lc = jnp.where(owned, pair_cell // W, 0)        # local cell id

            inc = jnp.zeros((Q, nlist_local), jnp.int32).at[
                pair_q, lc].add(owned.astype(jnp.int32))
            counts = jnp.sum(inc, axis=0)                   # (nlist_local,)
            rank = jnp.take((jnp.cumsum(inc, axis=0) - inc).reshape(-1),
                            pair_q * nlist_local + lc)      # (P,)
            tiles_per_cell = -(-counts // QT_G)
            tiles_before = jnp.cumsum(tiles_per_cell) - tiles_per_cell
            work_id = jnp.take(tiles_before, lc) + rank // QT_G
            slot = rank % QT_G
            valid = owned & (work_id < T_cap)
            overflow = jnp.sum((owned & ~valid).astype(jnp.int32))
            overflow = jax.lax.psum(overflow, axis)

            # OOB scatter indices are dropped (JAX default), masking invalid
            wid = jnp.where(valid, work_id, T_cap)
            row = wid * QT_G + slot
            work_cell = jnp.zeros((T_cap,), jnp.int32).at[wid].set(lc)
            qidx = jnp.full((T_cap * QT_G,), Q, jnp.int32).at[row].set(
                jnp.where(valid, pair_q, Q))
            return (work_cell, qidx.reshape(T_cap, QT_G), row, lc, valid,
                    overflow)

        def merge_local(scores_flat, row, lc, valid, cell_ids_l, Lpad):
            """Local candidate regroup + local top-k + all_gather merge —
            every pair is scored by exactly one device, so the merge is
            exact."""
            # row/lc/valid were computed in q-major pair order — reshape
            rows_pq = row.reshape(Q, nprobe)
            cells_pq = lc.reshape(Q, nprobe)
            valid_pq = valid.reshape(Q, nprobe)

            cand_s = jnp.take(scores_flat,
                              jnp.clip(rows_pq, 0, T_cap * QT_G - 1).reshape(-1),
                              axis=0).reshape(Q, nprobe, Lpad)
            cand_i = jnp.take(cell_ids_l,
                              jnp.clip(cells_pq, 0, nlist_local - 1).reshape(-1),
                              axis=0).reshape(Q, nprobe, Lpad)
            keep = valid_pq[:, :, None] & (cand_i >= 0)
            cand_s = jnp.where(keep, cand_s, -jnp.inf).reshape(Q, nprobe * Lpad)
            # non-kept slots carry REAL doc ids from local cell 0 (non-owned
            # pairs use lc=0): mask to -1 so a query with fewer real
            # candidates than topk pads with -1 like the single-chip path,
            # never with spurious duplicate ids
            cand_i = jnp.where(keep, cand_i, -1).reshape(Q, nprobe * Lpad)

            k_l = min(topk, nprobe * Lpad)
            s_l, pos = jax.lax.approx_max_k(cand_s, k_l, recall_target=1.0)
            i_l = jnp.take_along_axis(cand_i, pos.astype(jnp.int32), axis=1)
            all_s = jax.lax.all_gather(s_l, axis, axis=1, tiled=True)
            all_i = jax.lax.all_gather(i_l, axis, axis=1, tiled=True)
            k_g = min(topk, all_s.shape[1])
            s, pos = jax.lax.approx_max_k(all_s, k_g, recall_target=1.0)
            ids = jnp.take_along_axis(all_i, pos.astype(jnp.int32), axis=1)
            return s, ids

        def local_fn(q, coarse, pq_cent, cell_codes_l, cell_ids_l):
            Lpad = cell_codes_l.shape[1]
            work_cell, qidx, row, lc, valid, overflow = group_local(q, coarse)
            lut = permute_lut(build_lut(q, pq_cent), gm)
            MK = lut.shape[1]
            if lut_dtype == "int8":
                lut_i8, scales = quantize_lut_int8(lut, gm, K)
                lut_z = jnp.concatenate(
                    [lut_i8, jnp.zeros((1, MK), jnp.int8)], 0)
                scales_z = jnp.concatenate(
                    [scales, jnp.zeros((1, scales.shape[1]), jnp.float32)], 0)
            else:
                lut_z = jnp.concatenate(
                    [lut.astype(jnp.bfloat16),
                     jnp.zeros((1, MK), jnp.bfloat16)], 0)
                scales_z = None

            scores = _score_work_tiles(work_cell, qidx, lut_z, cell_codes_l, K,
                                       scales_z=scales_z)
            scores_flat = scores.reshape(T_cap * QT_G, Lpad)
            s, ids = merge_local(scores_flat, row, lc, valid, cell_ids_l, Lpad)
            return s, ids, overflow

        def local_fn_decoded(q, coarse, cell_vecs_l, cell_ids_l):
            Lpad = cell_vecs_l.shape[1]
            D = q.shape[1]
            work_cell, qidx, row, lc, valid, overflow = group_local(q, coarse)
            q_z = jnp.concatenate(
                [q.astype(jnp.bfloat16), jnp.zeros((1, D), jnp.bfloat16)], 0)
            scores = _score_work_tiles_decoded(work_cell, qidx, q_z,
                                               cell_vecs_l)
            scores_flat = scores.reshape(T_cap * QT_G, Lpad)
            s, ids = merge_local(scores_flat, row, lc, valid, cell_ids_l, Lpad)
            return s, ids, overflow

        def local_fn_decoded_i8(q, coarse, cell_vecs_l, cell_ids_l, scale):
            Lpad = cell_vecs_l.shape[1]
            D = q.shape[1]
            work_cell, qidx, row, lc, valid, overflow = group_local(q, coarse)
            # scale folding is deterministic per query: every device scores
            # with identical quantized queries, merge semantics unchanged
            q_f = q * scale[None, :]
            qscale = jnp.maximum(jnp.max(jnp.abs(q_f), axis=1), 1e-12) / 127.0
            q8 = jnp.clip(jnp.round(q_f / qscale[:, None]),
                          -127, 127).astype(jnp.int8)
            q8_z = jnp.concatenate([q8, jnp.zeros((1, D), jnp.int8)], 0)
            qscale_z = jnp.concatenate([qscale, jnp.zeros((1,), jnp.float32)])
            scores = _score_work_tiles_decoded_int8(work_cell, qidx, q8_z,
                                                    qscale_z, cell_vecs_l)
            scores_flat = scores.reshape(T_cap * QT_G, Lpad)
            s, ids = merge_local(scores_flat, row, lc, valid, cell_ids_l, Lpad)
            return s, ids, overflow

        if serving == "decoded":
            return jax.jit(shard_map(
                local_fn_decoded, mesh=self.mesh,
                in_specs=(P(), P(), P(axis), P(axis)),
                out_specs=(P(), P(), P()), check_vma=False))
        if serving == "decoded_int8":
            return jax.jit(shard_map(
                local_fn_decoded_i8, mesh=self.mesh,
                in_specs=(P(), P(), P(axis), P(axis), P()),
                out_specs=(P(), P(), P()), check_vma=False))
        return jax.jit(shard_map(local_fn, mesh=self.mesh,
                                 in_specs=(P(), P(), P(), P(axis), P(axis)),
                                 out_specs=(P(), P(), P()), check_vma=False))

    def search(self, query_embeds, topk: int = 1000, nprobe: int = 64,
               lut_dtype: str = "bf16", serving: str | None = None):
        s, i, overflow = self.search_device(query_embeds, topk, nprobe,
                                            lut_dtype=lut_dtype,
                                            serving=serving)
        if int(overflow) > 0:
            # self-heal exactly like the single-chip path: rerun once at the
            # worst-case tile shape, where overflow is impossible
            s, i, _ = self.search_device(query_embeds, topk, nprobe,
                                         capacity_factor=None,
                                         lut_dtype=lut_dtype,
                                         serving=serving)
        return _merge_spill(np.asarray(s), np.asarray(i), self.spill,
                            getattr(self, "spill_ids", None), query_embeds,
                            topk)


class PallasIVFIndex:
    """Device-resident IVF-PQ index served by the cell-grouped kernel.

    serving="adc" (default) scores tiles with the one-hot-decode ADC
    kernel from the M-bytes/doc code store. serving="decoded" keeps bf16
    RECONSTRUCTIONS HBM-resident (D*2 bytes/doc) and scores each tile as
    one fat MXU matmul — mathematically the same quantity (ADC's LUT sum
    IS dot(query, reconstruction)), built once from the same codes, and
    much faster when HBM has room (no one-hot VPU build, no LUT gather).
    enable_decoded_serving() can also be called lazily; search accepts a
    per-call serving= override."""

    def __init__(self, index: IVFIndex, serving: str = "adc"):
        self.host = index
        self.K = index.centroids.shape[1]
        self.nlist = index.nlist
        self.cell_codes = jnp.asarray(index.cell_codes)  # uint8, 1 byte/code
        self.cell_ids = jnp.asarray(index.cell_ids)
        self.coarse = jnp.asarray(index.coarse_centroids)
        self.cell_vecs = None
        self.doc_scale = None
        self.serving = serving
        self.set_centroids(index.centroids)
        self.spill = None
        if len(index.spill_ids):
            from repconc_tpu.index.pallas_adc import PallasADCIndex

            self.spill = PallasADCIndex(index.spill_codes, index.centroids)
            self.spill_ids = index.spill_ids

    def set_centroids(self, centroids):
        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        # K is a STATIC arg of the search jit (LUT width, kernel one-hot
        # geometry): keep it in sync with the codebook actually served
        self.K = self.centroids.shape[1]
        if getattr(self, "spill", None) is not None:
            self.spill.set_centroids(centroids)
        # reconstructions bake the codebook: drop the stale store on swap
        # (centroid swap after JPQ stage-2 is a supported flow) and rebuild
        # eagerly only when decoded residency is the DEFAULT serving mode
        self.cell_vecs, self.doc_scale = None, None
        if self.serving in ("decoded", "decoded_int8"):
            self._decoded_store(
                "int8" if self.serving == "decoded_int8" else "bf16")

    def _decoded_store(self, dtype: str):
        """Materialize (or reuse) the decoded-residency store WITHOUT
        touching the index's default serving mode (ADVICE r4 #2). Only one
        dtype is kept resident at a time — at 8.8M docs the bf16 (13.5 GB)
        and int8 (6.8 GB) stores would not co-fit in 16 GB HBM — so
        alternating dtypes per call rebuilds on each switch (a device-side
        jit over the codes; seconds at 1M scale)."""
        want = jnp.int8 if dtype == "int8" else jnp.bfloat16
        if self.cell_vecs is None or self.cell_vecs.dtype != want:
            if dtype == "int8":
                self.cell_vecs, self.doc_scale = decode_cells_int8(
                    self.cell_codes, self.centroids)
            else:
                self.cell_vecs = decode_cells(self.cell_codes,
                                              self.centroids)
                self.doc_scale = None
        return self.cell_vecs, self.doc_scale

    def enable_decoded_serving(self, dtype: str = "bf16"):
        """Materialize (nlist, Lpad, D) reconstructions on device and make
        decoded residency the DEFAULT serving mode — the only mutation
        point besides the constructor; a per-call search(serving=...)
        override materializes the store but leaves the default untouched.
        dtype="int8" stores scale-folded int8 (D bytes/doc, MXU s8 path —
        fits 8.8M docs on one chip where bf16 does not); "bf16" is exact
        to ADC-LUT precision."""
        self._decoded_store(dtype)
        self.serving = "decoded_int8" if dtype == "int8" else "decoded"
        return self

    def decoded_bytes(self, dtype: str = "bf16") -> int:
        """HBM cost of decoded residency (planning helper for callers
        choosing a serving mode against a memory budget)."""
        nlist, Lpad, _ = self.cell_codes.shape
        D = self.centroids.shape[0] * self.centroids.shape[2]
        return nlist * Lpad * D * (1 if dtype == "int8" else 2)

    def search_device(self, query_embeds, topk: int = 1000, nprobe: int = 64,
                      capacity_factor: float | None = 1.35,
                      lut_dtype: str = "bf16", serving: str | None = None):
        """Returns (scores, ids, overflow). With the default capacity_factor
        the work-tile grid is sized to the EXPECTED occupancy (+35%) instead
        of the ~55%-loose adversarial worst case — both the LUT-row gather
        and the kernel grid scale with it. overflow (device int32 scalar) is
        0 whenever the results are exact; a positive value means the probe
        mix was adversarially spread and the caller should re-search with
        capacity_factor=None (the worst-case shape). search() does this
        automatically; device-to-device callers fuse the overflow check into
        their own readback.

        lut_dtype="int8" serves with per-(query, group) quantized LUTs —
        halves the dominant LUT gather/DMA traffic for ~1% top-100 churn
        (the TPU analog of faiss's fp16-LUT mode, one step further; ADC
        serving only).

        serving overrides the index default per call ("adc" / "decoded")."""
        q = jnp.asarray(query_embeds, dtype=jnp.float32)
        Q = q.shape[0]
        nprobe = min(nprobe, self.nlist)
        T_worst = (Q * nprobe) // QT_G + self.nlist + 1
        T_max = (_tile_budget(Q, nprobe, self.nlist, capacity_factor)
                 if capacity_factor is not None else T_worst)
        mode = serving or self.serving
        if mode in ("decoded", "decoded_int8"):
            vecs, scale = self._decoded_store(
                "int8" if mode == "decoded_int8" else "bf16")
            return _ivf_search_device_decoded(
                q, self.coarse, vecs, self.cell_ids,
                nprobe, topk, T_max, doc_scale=scale)
        s, i, overflow = _ivf_search_device(
            q, self.centroids, self.coarse, self.cell_codes, self.cell_ids,
            nprobe, topk, self.K, T_max, lut_dtype)
        return s, i, overflow

    def search(self, query_embeds, topk: int = 1000, nprobe: int = 64,
               lut_dtype: str = "bf16", serving: str | None = None):
        s, i, overflow = self.search_device(query_embeds, topk, nprobe,
                                            lut_dtype=lut_dtype,
                                            serving=serving)
        if int(overflow) > 0:
            s, i, _ = self.search_device(query_embeds, topk, nprobe,
                                         capacity_factor=None,
                                         lut_dtype=lut_dtype,
                                         serving=serving)
        return _merge_spill(np.asarray(s), np.asarray(i), self.spill,
                            getattr(self, "spill_ids", None), query_embeds,
                            topk)
