"""Roofline analysis for the fused SW+LW solve (BASELINE.md section).

Answers "is N columns/s/chip fast?" with arithmetic instead of vibes:

  1. MEASURE the two candidate ceilings on the attached chip with
     microbenchmarks built exactly like the production kernels:
       * VPU f32 peak: a Pallas kernel issuing chained [8, 128] vector
         FMAs from VMEM (the production kernels' only compute primitive —
         they never touch the MXU: every op is a scalar-block x row-slab
         FMA, see ops/pallas_layer._matmul);
       * HBM stream bandwidth: a Pallas copy kernel over a large array.
  2. MODEL the work per column of a given configuration: FMA counts that
     mirror the structured factory kernel loop-for-loop
     (ops/pallas_layer.py) and the sweep kernels (ops/pallas_sweep.py),
     plus the minimum HBM traffic of the fused pipeline (gammas in,
     operator tiles out/in, interface stacks, outputs).
  3. Compare with the measured columns/s (bench.py) and name the binding
     limit.

Usage (on the TPU host):  python tools/roofline.py [--measure-only]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


# ----------------------------------------------------------------------
# Microbenchmarks (differential timing, same methodology as bench.py)
# ----------------------------------------------------------------------

def measure_vpu_peak_flops():
    """Chained dependent FMAs on [8, 128] f32 registers in VMEM: the
    per-lane issue ceiling the production kernels' row-slab algebra can
    at best saturate.  Returns FLOP/s (counting 2 FLOPs per FMA)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 64          # independent accumulator rows -> fills issue slots
    INNER = 512        # chained FMA steps per kernel invocation
    GRID = 512         # grid programs per call

    def kernel(x_ref, o_ref):
        acc = x_ref[...]
        b = acc + 1.0
        for _ in range(INNER):
            acc = acc * 1.0000001 + b
        o_ref[...] = acc

    x = jnp.ones((ROWS, 8, 128), jnp.float32)

    @jax.jit
    def run(x, n):
        def body(i, a):
            return pl.pallas_call(
                kernel,
                grid=(GRID,),
                in_specs=[pl.BlockSpec((ROWS, 8, 128), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, 8, 128), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, 8, 128), jnp.float32),
            )(a) + i * 0.0
        # Scalar checksum: fetching a VALUE is the only reliable completion
        # fence on the dev relay (its block_until_ready is asynchronous —
        # see BASELINE.md methodology / bench.py).
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    t = _differential_time(lambda n: run(x, n))
    flops_per_iter = 2.0 * ROWS * 8 * 128 * INNER * GRID
    return flops_per_iter / t


def measure_hbm_bw():
    """HBM read+write stream bandwidth via a grid copy kernel (bytes
    moved = 2 x array size per pass)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    MB = 1024
    ROWS = 512  # per-block rows of [8, 128] f32 = 2 MB blocks
    NBLK = 256  # 512 MB total

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.ones((NBLK, ROWS, 8, 128), jnp.float32)

    @jax.jit
    def run(x, n):
        def body(i, a):
            return pl.pallas_call(
                kernel,
                grid=(NBLK,),
                in_specs=[pl.BlockSpec((None, ROWS, 8, 128),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((None, ROWS, 8, 128),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NBLK, ROWS, 8, 128),
                                               jnp.float32),
            )(a)
        # Scalar checksum fence (see measure_vpu_peak_flops).
        return jnp.sum(jax.lax.fori_loop(0, n, body, x)[:, 0, 0, 0])

    t = _differential_time(lambda n: run(x, n), n_short=2, n_long=8)
    bytes_per_iter = 2.0 * x.size * 4
    return bytes_per_iter / t


def _differential_time(run_n, n_short=3, n_long=13):
    """run_n must return a SCALAR; float() of it is the completion fence
    (the dev relay's block_until_ready is asynchronous)."""
    assert np.isfinite(float(run_n(1)))
    steps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(n_short))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(n_long))
        tl = time.perf_counter() - t0
        steps.append(max(tl - ts, 1e-9) / (n_long - n_short))
    return float(np.median(steps))


# ----------------------------------------------------------------------
# Work model: FMA counts mirroring the kernels loop-for-loop
# ----------------------------------------------------------------------

def _fma_matmul(n, p, m):
    """ops/pallas_layer._matmul / _mmo: n*p row-slab FMAs of width m."""
    return n * p * m


def _fma_solve(n, m):
    """_solve_inplace: elimination sum_k (n-1-k)*( (n-k-1) + m ) + back
    substitution sum_i (n-1-i)*m + n*m (reciprocal scale)."""
    elim = sum((n - 1 - k) * ((n - k - 1) + m) for k in range(n - 1))
    back = sum((n - 1 - i) * m for i in range(n)) + n * m
    return elim + back


def factory_fmas(nd, ndir, K):
    """Structured factory kernel (_layer_kernel_structured +
    _extract_double + _schur_int_kernel) per batch element per layer."""
    n2, nr, N = nd * nd, nd * ndir, 2 * nd + ndir
    f = 0
    # assembly + norm + scaling: elementwise, ~5 nd^2 + 3 nr
    f += 5 * n2 + 3 * nr
    # half-size powers: W, W', W2, W'2, W^3, W'^3 + P21 + P12 = 8 matmuls
    f += 8 * _fma_matmul(nd, nd, nd)
    # polynomials (elementwise): ~6 nd^2
    f += 6 * n2
    # direct block: 4 ndir^3 matmuls + solve + elementwise
    f += 4 * _fma_matmul(ndir, ndir, ndir) + _fma_solve(ndir, ndir)
    # XY recurrences: 5 nd x nd x ndir + 9 nd x ndir x ndir + combos
    f += 5 * _fma_matmul(nd, nd, ndir) + 9 * _fma_matmul(nd, ndir, ndir)
    f += 4 * 3 * nr  # xv/yv/xu/yu combinations
    f += 2 * _fma_matmul(nd, nd, ndir) + _fma_matmul(nd, ndir, ndir)  # U13/U23
    # assemble + F33 correction: 2 * nd * ndir^2 + copies
    f += 2 * nd * ndir * ndir
    # (V - U) solve: 2nd system, N RHS
    f += _fma_solve(2 * nd, N)
    # butterfly: 8 nd^2 + 4 nr elementwise
    f += 8 * n2 + 4 * nr
    # extraction: solve nd x (nd+ndir) + T/Sdn products
    m_x = nd + ndir
    f += _fma_solve(nd, m_x) + _fma_matmul(nd, nd, m_x)
    # K doubling steps (per element): SupE + S_mid + (I-RR) + solve +
    # R@V + updates + E@E
    per_step = (
        _fma_matmul(nd, ndir, ndir)          # SupE
        + _fma_matmul(nd, nd, ndir)          # S_mid
        + _fma_matmul(nd, nd, nd)            # R@R
        + _fma_solve(nd, m_x)                # (I - RR) \ [T | S_mid]
        + _fma_matmul(nd, nd, m_x)           # R @ [Vt | Vs]
        + 2 * _fma_matmul(nd, nd, m_x)       # R/T/Sup/Sdn updates
        + _fma_matmul(nd, ndir, ndir)        # Sdn @ E
        + _fma_matmul(ndir, ndir, ndir)      # E @ E
    )
    f += K * per_step
    # Schur integral matrices: 2 nd-solves + 4 nd^3 products (+ direct)
    f += 2 * _fma_solve(nd, nd) + 4 * _fma_matmul(nd, nd, nd)
    f += _fma_solve(ndir, ndir) + _fma_matmul(nd, ndir, ndir) + \
        _fma_matmul(nd, nd, ndir)
    return f


def sweep_fmas(nd, ns, nreg):
    """SW up + two down sweeps (pallas_sweep.py) per element per layer."""
    na = (nreg + 1) * ns
    up = (
        _fma_matmul(nd, nd, nd)       # a_above @ R
        + _fma_solve(nd, nd)          # denom \ (a_above T)
        + _fma_matmul(nd, nd, nd) * 2  # a_above@T product + T @ at
        + _fma_solve(nd, nreg)        # d rhs solve
        + _fma_matmul(nd, nd, nreg) * 3
        + _fma_matmul(na, na, na)     # overlap transform a (u (x) m (x) v)
        + _fma_matmul(na, na, nreg + 1)
    )
    down = (
        _fma_matmul(na, na, 1) * 2    # up_below = a_below @ dn (matvec)
        + _fma_solve(nd, 1)           # denom \ rhs
        + _fma_matmul(nd, nd, 1) * 4  # T@dn, R@refl, a_above@dn, ints
        + _fma_matmul(nd, nd, 1)      # int_diff matvec
        + 6 * nd                      # absorption reductions
    )
    return up + 2 * down


def solve_work_model(nreg, ns, L, K_mean=3.0, lw=True):
    """(flops, hbm_bytes) per column for the fused SW(+LW) step."""
    nd, ndir = nreg * ns, nreg
    fl = factory_fmas(nd, ndir, int(round(K_mean))) * L
    fl += sweep_fmas(nd, ns, nreg) * L
    if lw:
        fl += factory_fmas(nd, 1, int(round(K_mean))) * L
        fl += sweep_fmas(nd, ns, nreg) * L * 0.8  # no direct component
    flops = 2.0 * fl  # FMA = 2 FLOPs

    # Minimum HBM traffic per column per band (f32): gammas written+read,
    # operator tiles written by the factory and read by 3 sweeps, interface
    # stacks written+read, scalar outputs.
    def band_bytes(nd, ndir, with_dir):
        g_rows = 2 * nd * nd + nd * ndir + ndir * ndir + 1
        op_rows = 2 * nd * nd + ndir * ndir + 2 * nd * ndir + nd * nd \
            + ndir * ndir + nd * ndir
        stack_rows = 2 * nd * nd + nd * ndir + \
            ((nreg + 1) * ns) ** 2 + (nreg + 1) * ns * (nreg + 1)
        per_layer = (
            2 * g_rows          # gammas: write by XLA prep + read by factory
            + op_rows           # factory writes ops
            + 2 * op_rows       # up sweep + ONE fused down pass read ops
            + 2 * stack_rows    # up writes stacks, the fused down reads them
            + 30                # per-layer outputs (~15 fields x 2 modes)
        )
        return 4.0 * per_layer
    hbm = band_bytes(nd, ndir, True) * L
    if lw:
        hbm += band_bytes(nd, 1, False) * L
    return flops, hbm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-only", action="store_true")
    ap.add_argument("--cols-per-sec", type=float, default=None,
                    help="Measured columns/s for the headline config"
                         " (default: use the bench.py r4 numbers)")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    vpu = measure_vpu_peak_flops()
    bw = measure_hbm_bw()
    print(f"measured VPU f32 peak:     {vpu / 1e12:.2f} TFLOP/s")
    print(f"measured HBM stream BW:    {bw / 1e9:.1f} GB/s")
    if args.measure_only:
        return

    configs = [
        ("headline nreg=2 ns=4 L=8 S=1", 2, 4, 8, 1, args.cols_per_sec),
        ("nreg=3 ns=4 L=8 S=1", 3, 4, 8, 1, None),
        ("rami5 nreg=3 ns=4 L=62 S=14", 3, 4, 62, 14, None),
    ]
    for name, nreg, ns, L, S, cps in configs:
        flops, hbm = solve_work_model(nreg, ns, L)
        flops, hbm = flops * S, hbm * S
        t_compute = flops / vpu
        t_mem = hbm / bw
        bound = "VPU" if t_compute > t_mem else "HBM"
        ceiling = 1.0 / max(t_compute, t_mem)
        line = (f"{name}: {flops / 1e6:.2f} MFLOP/col, {hbm / 1e3:.1f} KB/col"
                f" -> ceiling {ceiling:,.0f} cols/s ({bound}-bound)")
        if cps:
            line += (f"; measured {cps:,.0f} = {cps / ceiling:.0%} of the"
                     f" {bound} roofline")
        print(line)


if __name__ == "__main__":
    main()
