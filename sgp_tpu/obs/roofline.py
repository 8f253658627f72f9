"""Speed-of-light accounting for the hot kernel paths.

VERDICT round-2 items 2 and 5: a measured rate means nothing without
the attainable bound next to it. This module computes, from first
principles (public TPU v5e datasheet numbers), the per-dispatch floor
time of each SpMM representation and of the fused IID training step,
so ``bench.py`` can emit ``*_pct_of_roofline`` instead of bare rates.

The bound of a program is ``max(bytes_moved / HBM_BW, flops / peak)``
— whichever wall the program hits first. Everything here is
host-side arithmetic; nothing imports jax.
"""
from __future__ import annotations

from dataclasses import dataclass

# public TPU v5e figures
HBM_BW_BYTES_S = 819e9          # HBM bandwidth per chip
PEAK_BF16_FLOPS = 197e12        # MXU peak, bf16 inputs / f32 accumulate
F32_MXU_PASSES = 6              # 'highest' f32 matmul = 6 bf16 passes
# measured on this chip (r3 gather probe, bench log): a random-row
# gather of ~1 KB rows sustains ~20M rows/s regardless of sort order —
# latency-bound, far off the byte-bandwidth bound. Any bound on a
# random-gather program must include this term or it is fiction.
ROW_GATHER_LAT_S = 5.0e-8
# measured per-stored-block service floor for block-sparse SpMM at
# F=128 (r3 bench, N=40960 band): FOUR independent implementations —
# XLA batched-matmul and the hand-pipelined Pallas kernel, each in f32
# and bf16 — plateau at 650-780 ns/block, ~5x the 32-128 KB byte time,
# so the limiter is DMA issue/service latency, not bandwidth. The term
# scales by f_tiles only for the per-f-tile fetches (the Pallas kernel
# re-walks the store per F tile; the XLA variant amortizes — use the
# bound with f_tiles=1 for it).
BSR_BLOCK_LAT_S = 6.5e-7


@dataclass
class Bound:
    """A program's floor: seconds, and which wall sets it."""
    seconds: float
    hbm_seconds: float
    mxu_seconds: float
    lat_seconds: float = 0.0

    @property
    def limiter(self) -> str:
        if (self.lat_seconds >= self.hbm_seconds
                and self.lat_seconds >= self.mxu_seconds):
            return "latency"
        return "hbm" if self.hbm_seconds >= self.mxu_seconds else "mxu"

    def pct_of(self, measured_seconds: float) -> float:
        """Fraction of the attainable rate the measurement achieved."""
        return self.seconds / max(measured_seconds, 1e-12)


def _bound(bytes_moved: float, flops: float,
           precision: str = "default") -> Bound:
    passes = F32_MXU_PASSES if precision == "highest" else 1
    t_hbm = bytes_moved / HBM_BW_BYTES_S
    t_mxu = flops * passes / PEAK_BF16_FLOPS
    return Bound(max(t_hbm, t_mxu), t_hbm, t_mxu)


def dense_spmm_bound(n: int, f: int, itemsize: int = 4,
                     precision: str = "default") -> Bound:
    """One ``[N, N] @ [N, F]`` pass: the operator read dominates bytes;
    ``precision='highest'`` multiplies MXU passes, not bytes."""
    bytes_moved = n * n * itemsize + 2 * n * f * 4
    flops = 2.0 * n * n * f
    return _bound(bytes_moved, flops, precision)


def bsr_spmm_bound(nnzb: int, n_block_rows: int, f: int,
                   block: int = 128, blk_itemsize: int = 2,
                   x_itemsize: int = 4,
                   per_f_tile_walk: bool = True) -> Bound:
    """Block-sparse SpMM floor: per stored block, one block read plus
    one x-tile read per F tile; each output tile written once; PLUS the
    measured per-block DMA service floor (``BSR_BLOCK_LAT_S`` — the
    byte model alone overstates attainable rate ~5x at F=128, see the
    constant's derivation). ``per_f_tile_walk=False`` models the XLA
    batched-matmul variant, which reads the block store once for all F
    tiles."""
    f_tiles = max(1, -(-f // block))
    walk = f_tiles if per_f_tile_walk else 1
    bytes_moved = (nnzb * block * block * blk_itemsize * walk
                   + nnzb * block * block * x_itemsize * f_tiles
                   + n_block_rows * block * block * x_itemsize * f_tiles)
    flops = 2.0 * nnzb * block * block * block * f_tiles
    b = _bound(bytes_moved, flops)
    t_lat = nnzb * walk * BSR_BLOCK_LAT_S
    return Bound(max(b.seconds, t_lat), b.hbm_seconds, b.mxu_seconds,
                 t_lat)


def coo_spmm_bound(n_edges: int, n: int, f: int,
                   itemsize: int = 4) -> Bound:
    """Gather + segment-sum floor: per edge one x-row read and one
    message write/read around the segment reduction (VPU adds are
    free relative to the traffic)."""
    bytes_moved = (n_edges * (4 + 4 + itemsize)            # src/dst/w
                   + 3 * n_edges * f * itemsize            # gather + msg
                   + n * f * itemsize)                     # output
    flops = 2.0 * n_edges * f
    return _bound(bytes_moved, flops)


def iid_step_bound(batch: int, row_bytes: int, flops_per_step: float,
                   param_bytes: int = 0, gather_block: int = 1) -> dict:
    """The fused IID train step's floor: the sample-row gather is
    latency-bound random access (``ROW_GATHER_LAT_S`` per row — the
    byte-bandwidth term alone would understate it ~40x, measured);
    the fwd/bwd GEMMs are MXU time; Adam reads/writes the parameter
    state. Returns both the perfectly-overlapped floor (max; XLA-TPU
    runs ops sequentially, so this is unattainable on current
    hardware) and the serial floor (sum — the honest target).

    ``gather_block=G`` models the blocked gather (G consecutive rows
    per random draw): the latency term counts DRAWS, the byte term
    still counts every row."""
    t_gather = max(batch * row_bytes / HBM_BW_BYTES_S,
                   batch // max(gather_block, 1) * ROW_GATHER_LAT_S)
    t_mxu = flops_per_step / PEAK_BF16_FLOPS
    t_adam = param_bytes / HBM_BW_BYTES_S
    overlap = max(t_gather, t_mxu, t_adam)
    serial = t_gather + t_mxu + t_adam
    return {"t_gather_bound_s": t_gather, "t_mxu_bound_s": t_mxu,
            "t_adam_bound_s": t_adam, "floor_overlap_s": overlap,
            "floor_serial_s": serial}
