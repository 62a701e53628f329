"""The unified SPARTACUS multi-layer solver (forest + urban, SW + LW).

One solver covers all layered tile types: a forest is an urban canopy with
building_fraction == 0 (the urban region fractions, perimeters and overlap
matrices reduce exactly to the forest ones in that limit — the property
exercised by the reference's consistency test, test/simple/README:8-11).

Structure (matching the three-phase shape of the reference solvers,
radsurf/radsurf_urban_sw.F90 / radsurf_urban_lw.F90 / radsurf_forest_sw.F90 /
radsurf_forest_lw.F90):

  phase 1  per-layer operators:   ONE huge batched call over
           [ncol, nlay, nspec] to ops.layer_matrices — this is the hot
           kernel and replaces the reference's per-layer eigen factory loop
           (radsurf_urban_sw.F90:335-585).
  phase 2  upward adding scan:    lax.scan over layers computing interface
           albedo/source operators (radsurf_urban_sw.F90:604-654,
           radsurf_urban_lw.F90:567-614).
  phase 3  downward flux scans:   lax.scan (reverse) computing the
           normalized flux profiles, absorption integrals and sunlit
           fractions (radsurf_urban_sw.F90:676-1001,
           radsurf_urban_lw.F90:639-858).

Ragged columns are dense-padded ABOVE the real canopy with dz = 0 layers
(zero fractions/extinctions): expm(Gamma*0) = I makes every padding layer an
exact no-op, and the free-atmosphere fractions [1, 0, ...] of padding layers
reproduce the reference's top-of-canopy overlap at the real canopy top
(radsurf_overlap.F90:341-346).

The cosine of the solar zenith angle is clamped to >= 1e-6 throughout, as in
the urban reference path (radsurf_urban_sw.F90:268); callers skip the SW
solve entirely when the sun is below the horizon
(radsurf_interface.F90:183,217,248).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layer_matrices import layer_matrices, lw_layer_matrices
from ..ops.legendre_gauss import LegendreGauss
from ..ops.matrix import matmul, matvec, solve
from ..utils.constants import Pi
from . import gamma as G
from .geometry import (
    norm_perim_urban,
    od_scaling_from_fsd,
    overlap_matrices_urban,
    region_fracs,
)


# ----------------------------------------------------------------------
# Expanded-overlap products (the reference's rect_expandedmat_* family,
# radtool/radtool_matrix.F90:505-651): overlap matrices act on the region
# index of vectors/matrices whose combined index is (region, stream).
# ----------------------------------------------------------------------

def _safe_div(num, den):
    """num / den with 0 where the denominator has underflowed to ~0.

    Used for the clear-sky-normalized sunlit fractions: at horizon sun
    through a thick canopy the clear direct beam extinguishes completely
    (exp(-od) underflows), and the reference's unguarded division would
    FPE-trap (-ffpe-trap=invalid, Makefile_include.gfortran:14); here the
    physically-correct limit is "nothing is sunlit" = 0."""
    tiny = jnp.asarray(np.finfo(jnp.result_type(den)).tiny, den.dtype)
    ok = den > tiny
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def _ov_vec(ov, x, ns):
    """[C, A, B] region-overlap applied to [C, S, B*ns] -> [C, S, A*ns]."""
    c, s, _ = x.shape
    b = ov.shape[-1]
    xr = x.reshape(c, s, b, ns)
    out = jnp.einsum("cab,csbn->csan", ov, xr, precision="highest")
    return out.reshape(c, s, ov.shape[-2] * ns)


def _ov_dirvec(ov, x):
    """[C, A, B] applied to direct vector [C, S, B] -> [C, S, A]."""
    return jnp.einsum("cab,csb->csa", ov, x, precision="highest")


def _u_mat_v(u, m, v, ns):
    """a_above' = (u (x) I_ns) @ m @ (v (x) I_ns).

    u: [C, A, B]; m: [C, S, B*ns, B2*ns]; v: [C, B2, A2] -> [C, S, A*ns, A2*ns]
    (parity: radsurf_urban_sw.F90:646-649).
    """
    c, s = m.shape[:2]
    b = u.shape[-1]
    b2 = v.shape[-2]
    mr = m.reshape(c, s, b, ns, b2, ns)
    out = jnp.einsum("ctq,csqurv,crf->cstufv", u, mr, v, precision="highest")
    a, a2 = u.shape[-2], v.shape[-1]
    return out.reshape(c, s, a * ns, a2 * ns)


def _u_dmat_v(u, d, v, ns):
    """d_above' = (u (x) I_ns) @ d @ v.

    u: [C, A, B]; d: [C, S, B*ns, B2]; v: [C, B2, A2] -> [C, S, A*ns, A2]
    (parity: radsurf_urban_sw.F90:650-653).
    """
    c, s = d.shape[:2]
    b = u.shape[-1]
    dr = d.reshape(c, s, b, ns, d.shape[-1])
    out = jnp.einsum("ctq,csqur,crf->cstuf", u, dr, v, precision="highest")
    return out.reshape(c, s, u.shape[-2] * ns, v.shape[-1])


def _u_vec(u, x, ns):
    """source_above' = (u (x) I_ns) @ x;  u: [C, A, B], x: [C, S, B*ns]."""
    return _ov_vec(u, x, ns)


# ----------------------------------------------------------------------
# Inputs container (a pytree of dense padded arrays for one column group)
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class CanopyInputs:
    """Dense padded inputs for a group of columns sharing one solver config.

    Shapes: [C] per-column, [C, L] per-layer (L = padded layer count,
    bottom-up, padding above the canopy with dz=0 and zero fractions),
    [C, S] per-column-spectral, [C, L, S] per-layer-spectral.
    """

    dz: jnp.ndarray  # [C, L]
    cos_sza: jnp.ndarray  # [C]
    veg_fraction: jnp.ndarray  # [C, L]
    veg_scale: jnp.ndarray  # [C, L]
    veg_ext: jnp.ndarray  # [C, L]
    veg_fsd: jnp.ndarray  # [C, L]
    veg_contact_fraction: jnp.ndarray  # [C, L]
    building_fraction: jnp.ndarray  # [C, L]
    building_scale: jnp.ndarray  # [C, L]
    air_ext: jnp.ndarray  # [C, L, S]
    air_ssa: jnp.ndarray  # [C, L, S]
    veg_ssa: jnp.ndarray  # [C, L, S]
    # SW facet properties (None for LW)
    ground_albedo: jnp.ndarray | None = None  # [C, S]
    ground_albedo_dir: jnp.ndarray | None = None  # [C, S]
    roof_albedo: jnp.ndarray | None = None  # [C, L, S]
    roof_albedo_dir: jnp.ndarray | None = None  # [C, L, S]
    wall_albedo: jnp.ndarray | None = None  # [C, L, S]
    wall_specular_frac: jnp.ndarray | None = None  # [C, L, S]
    # LW facet/volume properties (None for SW)
    ground_emissivity: jnp.ndarray | None = None  # [C, S]
    ground_emission: jnp.ndarray | None = None  # [C, S]
    roof_emissivity: jnp.ndarray | None = None  # [C, L, S]
    roof_emission: jnp.ndarray | None = None  # [C, L, S]
    wall_emissivity: jnp.ndarray | None = None  # [C, L, S]
    wall_emission: jnp.ndarray | None = None  # [C, L, S]
    clear_air_planck: jnp.ndarray | None = None  # [C, L, S]
    veg_planck: jnp.ndarray | None = None  # [C, L, S]
    veg_air_planck: jnp.ndarray | None = None  # [C, L, S]


@dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration for one column group."""

    nreg: int
    nstream: int
    do_urban: bool  # include wall/roof physics and outputs
    use_symmetric_vegetation_scale: bool = True
    vegetation_isolation_factor: float = 0.0
    min_vegetation_fraction: float = 1.0e-6
    min_building_fraction: float = 1.0e-6
    # Doubling-step CAP for the norm-adaptive expm factory: handles
    # per-layer ||Gamma dz|| up to theta*2**n_double.  30 covers the most
    # extreme attainable system — horizon sun (cos_sza clamped at 1e-6)
    # injects tan(theta) ~ 1e6 wall/direct terms, and ext*dz ~ 1e3 —
    # whose norm is ~1e9; a smaller cap silently truncates the Pade
    # argument and the layer operators come out wrong (found by the
    # property fuzzer: top_albedo 5.5e4 at cap 12).  Adaptive K means
    # typical layers still take only their ceil(log2(norm/2)) steps.
    n_double: int = 30
    # Chunk size for the per-layer operator factory: bounds the transient
    # HBM footprint of the expm working set (XLA pads the trailing
    # small-matrix dims to (8,128) tiles, a ~10x expansion, so unchunked
    # factories OOM beyond ~16k columns/chip).  0 = no chunking.  Unit:
    # COLUMNS on the unfused paths; on the fused tile-native path the
    # chunk applies to the flattened column x spectral batch (C*S
    # elements, rounded down to whole 1024-element kernel tiles), so
    # multiband runs chunk at batch-element rather than column
    # granularity.
    factory_chunk: int = 8192
    # Run the expm+doubling stage through the hand-written batch-in-lanes
    # Pallas kernel (ops/pallas_layer.py) instead of the XLA path.
    # None = auto: ON when the backend is a real TPU (measured ~6x faster
    # than the XLA path on v5e), OFF elsewhere (the interpreter is slow).
    # SPARTACUS_PALLAS=1/0 force-overrides.  The XLA path remains the
    # reference implementation.
    use_pallas_factory: bool | None = None
    # Run the adding-method up-sweep and flux down-sweeps through the
    # batch-in-lanes Pallas kernels (ops/pallas_sweep.py) instead of the
    # XLA lax.scan path.  None = auto (same policy as the factory, plus a
    # VMEM-footprint guard on the system size).  SPARTACUS_PALLAS_SWEEPS=1/0
    # force-overrides.
    use_pallas_sweeps: bool | None = None
    # Replace the sequential lax.scan adding/flux recurrences with
    # O(log nlay)-depth associative scans (ops/assoc_adding.py): the
    # upward interface-operator build becomes a Redheffer-star prefix
    # composition, the downward flux recurrence a suffix composition of
    # block-affine carry maps.  ~4-6x more FLOPs but L/log2(L) less
    # dependency depth — for very deep canopies (hundreds of layers) at
    # small batch, where the layer chain rather than throughput binds.
    # XLA path only (forces the Pallas sweep kernels off); parity with
    # the scan path is exercised in tests/test_associative.py.
    associative_sweeps: bool = False
    # Solve in column chunks of this size via lax.map (0 = whole batch in
    # one pass; -1 = AUTO, see _resolve_column_chunk).  Bounds the HBM
    # working set — the per-interface operator stacks are the largest
    # transient (~70 KB/column at nreg=2, ns=4, L=8) — so datasets of 1M+
    # columns fit on one chip.  Columns are padded up to a chunk multiple
    # with no-op values and sliced off.  Chunking is also a measured perf
    # WIN on the fused kernel path (~2k-column chunks keep the transient
    # operator stacks streaming instead of thrashing HBM: v5e headline
    # 1.70M -> 2.18M cols/s, nreg=3 744k -> 818k), which is what AUTO
    # exploits.  Under a mesh, run_radsurf executes the solver inside
    # jax.shard_map, so the chunk reshape (and AUTO resolution) sees the
    # per-device LOCAL batch — chunking composes with sharding instead
    # of being disabled by it.
    column_chunk: int = 0


# ----------------------------------------------------------------------
# Shared geometry preparation
# ----------------------------------------------------------------------

def _prepare_geometry(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss,
                      lw: bool):
    nreg = opt.nreg
    # building_fraction is pre-sanitized to zeros for forest solves by
    # _sanitize_forest (public entry points) — see that helper's docstring.
    frac = region_fracs(inp.veg_fraction, inp.building_fraction, nreg)
    od_scal = od_scaling_from_fsd(inp.veg_fsd, nreg)
    u_ov, v_ov = overlap_matrices_urban(frac, nreg, opt.min_vegetation_fraction)
    norm_perim, norm_perim_wall = norm_perim_urban(
        inp.building_fraction,
        inp.building_scale,
        inp.veg_fraction,
        inp.veg_scale,
        inp.veg_contact_fraction,
        nreg=nreg,
        use_symmetric_vegetation_scale=opt.use_symmetric_vegetation_scale,
        vegetation_isolation_factor=opt.vegetation_isolation_factor,
        min_vegetation_fraction=opt.min_vegetation_fraction,
        min_building_fraction=opt.min_building_fraction,
    )
    f_exchange = G.exchange_rates(
        norm_perim, frac, nreg, opt.min_vegetation_fraction
    )
    adjustment = lg.vadjustment2 if lw else 1.0
    f_wall = G.wall_rates(
        norm_perim_wall, frac, nreg, opt.min_vegetation_fraction, adjustment
    )
    if not opt.do_urban:
        f_wall = jnp.zeros_like(f_wall)
    return dict(
        frac=frac,
        od_scaling=od_scal,
        u_ov=u_ov,
        v_ov=v_ov,
        norm_perim_wall=norm_perim_wall,
        f_exchange=f_exchange,
        f_wall=f_wall,
    )


def debug_dump_sw(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss):
    """PRINT_ARRAYS equivalent: print the geometry and Gamma matrices for
    the first column/band (cf. radsurf_forest_sw.F90:389-403)."""
    from ..utils.debug import maybe_dump

    zcos = jnp.maximum(inp.cos_sza, 1.0e-6)
    sin0 = jnp.sqrt(1.0 - zcos * zcos)
    geo = _prepare_geometry(inp, opt, lg, lw=False)
    ext_reg, ssa_reg = G.region_optics_sw(
        inp.air_ext, inp.air_ssa, inp.veg_ext, inp.veg_ssa,
        geo["od_scaling"], opt.nreg,
    )
    wall_ext = (
        1.0 - inp.wall_albedo * inp.wall_specular_frac
        if opt.do_urban else jnp.zeros_like(inp.air_ext)
    )
    wall_factor = (
        inp.wall_albedo * (1.0 - inp.wall_specular_frac)
        if opt.do_urban else jnp.zeros_like(inp.air_ext)
    )
    g0, g1, g2, g3 = G.assemble_gammas(
        ext_reg, ssa_reg, geo["f_exchange"], geo["f_wall"],
        wall_ext, wall_factor, lg, opt.nreg,
        cos_sza=zcos, sin_sza=sin0, tan_sza=sin0 / zcos,
    )
    maybe_dump("SW first column, layer 0, band 0", {
        "frac": geo["frac"][0, 0],
        "od_scaling": geo["od_scaling"][0, 0],
        "f_exchange": geo["f_exchange"][0, 0],
        "f_wall": geo["f_wall"][0, 0],
        "norm_perim_wall": geo["norm_perim_wall"][0, 0],
        "u_overlap": geo["u_ov"][0, 0],
        "v_overlap": geo["v_ov"][0, 0],
        "ext_reg": ext_reg[0, 0, 0],
        "ssa_reg": ssa_reg[0, 0, 0],
        "gamma0": g0[0, 0, 0],
        "gamma1": g1[0, 0, 0],
        "gamma2": g2[0, 0, 0],
        "gamma3": g3[0, 0, 0],
    })


def _itransp(air_ext, dz):
    """Most transparent spectral interval per column
    (radsurf_urban_sw.F90:310)."""
    total_od = jnp.sum(air_ext * dz[..., None], axis=1)  # [C, S]
    return jnp.argmin(total_od, axis=-1)  # [C]


def _take_spec(x, itr):
    """Gather the itransp spectral slice: [C, ..., S] -> [C, ...]."""
    itr_b = itr.reshape(itr.shape + (1,) * (x.ndim - 1))
    return jnp.take_along_axis(x, itr_b, axis=-1)[..., 0]


# ----------------------------------------------------------------------
# Shortwave solver
# ----------------------------------------------------------------------

def _spartacus_sw_impl(inp: CanopyInputs, opt: SolverOptions,
                       lg: LegendreGauss, with_profiles: bool = False):
    """Shortwave solve for one column group.

    Returns (norm_dir, norm_diff, bc) where norm_dir/norm_diff are flux dicts
    normalized by the top-of-canopy direct / diffuse downwelling flux
    respectively, and bc = {"top_albedo_diff", "top_albedo_dir"} [C, S].
    Parity: radsurf/radsurf_urban_sw.F90:35-1007 (forest =
    radsurf_forest_sw.F90 via building_fraction = 0).
    """
    nreg, ns = opt.nreg, lg.nstream
    nd = nreg * ns
    C, L = inp.dz.shape
    S = inp.air_ext.shape[-1]
    dtype = inp.air_ext.dtype
    mu = np.asarray(lg.mu, dtype)
    hw = np.asarray(lg.hweight, dtype)
    tan_s = np.asarray(lg.tan_ang, dtype)

    zcos = jnp.maximum(inp.cos_sza, 1.0e-6)
    sin0 = jnp.sqrt(1.0 - zcos * zcos)
    tan0 = sin0 / zcos

    geo = _prepare_geometry(inp, opt, lg, lw=False)
    frac = geo["frac"]

    # Wall extinction/scattering factors (radsurf_urban_sw.F90:412-418)
    if opt.do_urban:
        wall_ext = 1.0 - inp.wall_albedo * inp.wall_specular_frac
        wall_factor = inp.wall_albedo * (1.0 - inp.wall_specular_frac)
        wall_albedo = inp.wall_albedo
    else:
        wall_ext = jnp.zeros((C, L, S), dtype)
        wall_factor = jnp.zeros((C, L, S), dtype)
        wall_albedo = jnp.zeros((C, L, S), dtype)

    ext_reg, ssa_reg = G.region_optics_sw(
        inp.air_ext, inp.air_ssa, inp.veg_ext, inp.veg_ssa,
        geo["od_scaling"], nreg,
    )
    g0, g1, g2, g3 = G.assemble_gammas(
        ext_reg, ssa_reg, geo["f_exchange"], geo["f_wall"],
        wall_ext, wall_factor, lg, nreg,
        cos_sza=zcos, sin_sza=sin0, tan_sza=tan0,
    )
    dz_b = jnp.broadcast_to(inp.dz[:, :, None], (C, L, S))
    g0 = jnp.broadcast_to(g0, (C, L, S, nreg, nreg))
    use_pf = _use_pallas(opt)
    use_ps = _use_pallas_sweeps(opt, lg) and not opt.associative_sweeps

    if use_pf and use_ps:
        # Fused tile-native path: gammas are relaid out ONCE into the
        # kernel tile layout; factory outputs flow to the sweep kernels as
        # raw [nb, L, rows, 8, 128] tiles with zero intermediate copies
        # (ROADMAP item 1: the former untile -> transpose -> retile glue).
        from ..ops.pallas_layer import pallas_layer_tiles

        dtype = g1.dtype
        gbl, dz_bl, chunk_nb = _tiled_gamma_prep(
            inp.dz, C, S, L, dtype, opt.factory_chunk
        )
        lay = pallas_layer_tiles(
            gbl(g0, nreg, nreg), gbl(g1, nd, nd), gbl(g2, nd, nd),
            gbl(g3, nd, nreg), dz_bl,
            nd=nd, ndir=nreg, n_double=opt.n_double, chunk_nb=chunk_nb,
        )
        return _sw_pallas_path(
            inp, opt, lg, geo, lay, zcos, sin0, with_profiles, tiled=True
        )

    # lay entries come back with the matrix dims FLATTENED ([C,L,S,n*m]):
    # storage/bandwidth-optimal on TPU; unflattened views are taken per
    # scan step.
    if use_pf:
        from ..ops.pallas_layer import pallas_layer_matrices

        factory = lambda a: pallas_layer_matrices(*a, n_double=opt.n_double)
    else:
        factory = lambda a: layer_matrices(*a, n_double=opt.n_double)
    lay = _chunked_factory(factory, (g0, g1, g2, g3, dz_b),
                           opt.factory_chunk)

    if use_ps:
        return _sw_pallas_path(
            inp, opt, lg, geo, lay, zcos, sin0, with_profiles
        )

    # ------------------------------------------------------------------
    # Phase 2: upward adding scan (radsurf_urban_sw.F90:590-654)
    # ------------------------------------------------------------------
    galb = inp.ground_albedo  # [C, S]
    galb_dir = inp.ground_albedo_dir
    # Ground albedo operators: same-region coupling only
    # (radsurf_urban_sw.F90:593-602)
    block = np.zeros((nreg, ns, nreg, ns))
    for r in range(nreg):
        block[r, :, r, :] = 1.0
    same_reg = jnp.asarray(
        (block * hw[None, :, None, None]).reshape(nd, nd), dtype
    )
    a_ground = galb[:, :, None, None] * same_reg  # [C, S, nd, nd]
    dblock = np.zeros((nreg, ns, nreg))
    for r in range(nreg):
        dblock[r, :, r] = hw
    dmask = jnp.asarray(dblock.reshape(nd, nreg), dtype)
    d_ground = (zcos[:, None] * galb_dir)[:, :, None, None] * dmask

    roof_alb = inp.roof_albedo if opt.do_urban else jnp.zeros((C, L, S), dtype)
    roof_alb_dir = (
        inp.roof_albedo_dir if opt.do_urban else jnp.zeros((C, L, S), dtype)
    )

    def up_step(carry, x):
        a_above, d_above = carry
        Rf, Tf, Ef, Supf, Sdnf, u_ov, v_ov, ralb, ralb_dir = x
        R = _unflat(Rf, nd, nd)
        T = _unflat(Tf, nd, nd)
        E = _unflat(Ef, nreg, nreg)
        Sup = _unflat(Supf, nd, nreg)
        Sdn = _unflat(Sdnf, nd, nreg)
        eye = jnp.eye(nd, dtype=dtype)
        denom = eye - matmul(a_above, R)
        # a_below/d_below for the permeable regions
        # (radsurf_urban_sw.F90:607-625)
        at = solve(denom, matmul(a_above, T))
        a_below_reg = R + matmul(T, at)
        d_rhs = matmul(d_above, E) + matmul(a_above, Sdn)
        d_below_reg = Sup + matmul(T, solve(denom, d_rhs))
        # Exposed-roof rows (radsurf_urban_sw.F90:627-643): build the full
        # (nreg+1)*ns square/rect operators
        a_roof = (ralb[:, :, None, None] * hw[:, None]) * jnp.ones(
            (ns, ns), dtype
        )  # [C, S, ns, ns]
        d_roof = (zcos[:, None] * ralb_dir)[:, :, None] * hw  # [C, S, ns]
        a_below = jnp.zeros((C, S, (nreg + 1) * ns, (nreg + 1) * ns), dtype)
        a_below = a_below.at[..., :nd, :nd].set(a_below_reg)
        a_below = a_below.at[..., nd:, nd:].set(a_roof)
        d_below = jnp.zeros((C, S, (nreg + 1) * ns, nreg + 1), dtype)
        d_below = d_below.at[..., :nd, :nreg].set(d_below_reg)
        d_below = d_below.at[..., nd:, nreg].set(d_roof)
        # Overlap to just above the interface (radsurf_urban_sw.F90:646-653)
        a_above_new = _u_mat_v(u_ov, a_below, v_ov, ns)
        d_above_new = _u_dmat_v(u_ov, d_below, v_ov, ns)
        ys = (_flat(a_above), _flat(d_above), _flat(denom), _flat(a_below),
              _flat(d_below))
        return (a_above_new, d_above_new), ys

    xs = (
        lay["R"].transpose(1, 0, 2, 3),
        lay["T"].transpose(1, 0, 2, 3),
        lay["E"].transpose(1, 0, 2, 3),
        lay["Sup"].transpose(1, 0, 2, 3),
        lay["Sdn"].transpose(1, 0, 2, 3),
        geo["u_ov"].transpose(1, 0, 2, 3),
        geo["v_ov"].transpose(1, 0, 2, 3),
        roof_alb.transpose(1, 0, 2),
        roof_alb_dir.transpose(1, 0, 2),
    )
    if opt.associative_sweeps:
        # Log-depth route: all per-layer carry-ins at once via the
        # Redheffer-star prefix composition, then ONE vmapped up_step
        # recovers the per-layer ys (identical local algebra, no chain).
        from ..ops.assoc_adding import (
            ground_star_element,
            star_prefix,
            sw_layer_star_elements,
        )

        elems = sw_layer_star_elements(
            _unflat(xs[0], nd, nd), _unflat(xs[1], nd, nd),
            _unflat(xs[2], nreg, nreg), _unflat(xs[3], nd, nreg),
            _unflat(xs[4], nd, nreg), xs[5], xs[6],
            xs[7][..., None, None] * (hw[:, None] * jnp.ones((ns, ns), dtype)),
            (zcos[None, :, None] * xs[8])[..., None] * jnp.asarray(hw, dtype),
            nreg, ns,
        )
        prefix = star_prefix(
            elems, ground_star_element(a_ground, d_ground, nreg)
        )
        a_top, d_top = prefix["Rd"][-1], prefix["Su"][-1]
        _, ys = jax.vmap(up_step)((prefix["Rd"][:-1], prefix["Su"][:-1]), xs)
    else:
        (a_top, d_top), ys = jax.lax.scan(up_step, (a_ground, d_ground), xs)
    a_above_l, d_above_l, denom_l, a_below_l, d_below_l = ys

    # Top-of-canopy boundary conditions (radsurf_urban_sw.F90:668-674)
    hw_b = jnp.asarray(hw, dtype)
    top_albedo_diff = jnp.einsum(
        "csij,j->cs", a_top[..., :ns, :ns], hw_b, precision="highest"
    )
    top_albedo_dir = jnp.sum(d_top[..., :ns, 0], axis=-1) / zcos[:, None]
    bc = {"top_albedo_diff": top_albedo_diff, "top_albedo_dir": top_albedo_dir}

    # ------------------------------------------------------------------
    # Phase 3: downward flux sweeps (radsurf_urban_sw.F90:676-1001)
    # ------------------------------------------------------------------
    air_abs_coef = inp.air_ext * (1.0 - inp.air_ssa)  # [C, L, S]
    veg_abs_coef = inp.veg_ext[..., None] * (1.0 - inp.veg_ssa)  # [C, L, S]
    itr = _itransp(inp.air_ext, inp.dz)
    air_ext_t = jnp.take_along_axis(inp.air_ext, itr[:, None, None], axis=-1)[..., 0]

    # Roof/non-building fractions (radsurf_urban_sw.F90:292-298);
    # building_fraction is zeros for forest (_sanitize_forest)
    bf_above = jnp.concatenate(
        [inp.building_fraction[:, 1:], jnp.zeros((C, 1), dtype)], axis=1
    )
    roof_fraction = jnp.maximum(0.0, inp.building_fraction - bf_above)
    nbf = 1.0 - inp.building_fraction  # [C, L]
    nbf_above = 1.0 - bf_above

    # Clear-sky direct transmittance per layer at itransp
    # (radsurf_urban_sw.F90:817)
    trans_dir_clear = jnp.exp(-air_ext_t * inp.dz / zcos[:, None])  # [C, L]

    # f_wall treating all non-building regions as clear
    # (radsurf_urban_sw.F90:405-410)
    npw_sum = jnp.sum(geo["norm_perim_wall"], axis=-1)
    f_wall_dir_clear = jnp.where(
        nbf > opt.min_building_fraction,
        npw_sum / (Pi * jnp.maximum(nbf, opt.min_building_fraction)),
        0.0,
    )

    def sweep(with_direct: bool):
        eps = jnp.finfo(dtype).eps

        def down_step(carry, x):
            dn_dir, dn_diff, dn_dir_clear = carry
            (Rf, Tf, Ef, Sdnf, int_dirf, int_difff, int_dir_difff, a_abovef,
             d_abovef, denomf, a_belowf, d_belowf, u_ov, v_ov, fw, fwdc,
             od_l, ab_coef, vb_coef, wa, dz_l, aet, rfrac, nbf_l, nbfa, tdc,
             vfr) = x
            R = _unflat(Rf, nd, nd)
            T = _unflat(Tf, nd, nd)
            E = _unflat(Ef, nreg, nreg)
            Sdn = _unflat(Sdnf, nd, nreg)
            int_dir = _unflat(int_dirf, nreg, nreg)
            int_diff = _unflat(int_difff, nd, nd)
            int_dir_diff = _unflat(int_dir_difff, nd, nreg)
            a_above = _unflat(a_abovef, nd, nd)
            d_above = _unflat(d_abovef, nd, nreg)
            denom = _unflat(denomf, nd, nd)
            a_below = _unflat(a_belowf, (nreg + 1) * ns, (nreg + 1) * ns)
            d_below = _unflat(d_belowf, (nreg + 1) * ns, nreg + 1)
            # Translate across the interface at layer top
            # (radsurf_urban_sw.F90:707-714)
            dn_dir_below = _ov_dirvec(v_ov, dn_dir)  # [C, S, nreg+1]
            dn_diff_below = _ov_vec(v_ov, dn_diff, ns)  # [C, S, (nreg+1)ns]
            up_below = matvec(a_below, dn_diff_below)
            if with_direct:
                up_below = up_below + matvec(d_below, dn_dir_below)
            out = {}
            # Roof fluxes (radsurf_urban_sw.F90:716-721)
            roof_in_dir = zcos[:, None] * dn_dir_below[..., nreg]
            roof_in = jnp.sum(dn_diff_below[..., nd:], axis=-1)
            roof_up = jnp.sum(up_below[..., nd:], axis=-1)
            if with_direct:
                roof_in = roof_in + roof_in_dir
            out["roof_in"] = roof_in
            out["roof_net"] = roof_in - roof_up
            if with_direct:
                out["roof_in_dir"] = roof_in_dir
            # Fluxes at layer base (radsurf_urban_sw.F90:723-735)
            if with_direct:
                dn_dir_new = matvec(E, dn_dir_below[..., :nreg])
                refl_dir = matvec(d_above, dn_dir_new)
                rhs = (
                    matvec(T, dn_diff_below[..., :nd])
                    + matvec(R, refl_dir)
                    + matvec(Sdn, dn_dir_below[..., :nreg])
                )
                dn_diff_new = solve(denom, rhs)
                up_above = matvec(a_above, dn_diff_new) + refl_dir
            else:
                dn_dir_new = dn_dir
                dn_diff_new = solve(denom, matvec(T, dn_diff_below[..., :nd]))
                up_above = matvec(a_above, dn_diff_new)
            # Flux profiles (radsurf_urban_sw.F90:737-751)
            if with_profiles:
                out["flux_dn_layer_top"] = jnp.sum(
                    dn_diff_below[..., :nd], axis=-1
                )
                out["flux_up_layer_top"] = jnp.sum(up_below[..., :nd], axis=-1)
                out["flux_dn_layer_base"] = jnp.sum(dn_diff_new, axis=-1)
                out["flux_up_layer_base"] = jnp.sum(up_above, axis=-1)
                if with_direct:
                    out["flux_dn_dir_layer_top"] = zcos[:, None] * jnp.sum(
                        dn_dir_below[..., :nreg], axis=-1
                    )
                    out["flux_dn_dir_layer_base"] = zcos[:, None] * jnp.sum(
                        dn_dir_new, axis=-1
                    )
                    out["flux_dn_layer_top"] = (
                        out["flux_dn_layer_top"] + out["flux_dn_dir_layer_top"]
                    )
                    out["flux_dn_layer_base"] = (
                        out["flux_dn_layer_base"]
                        + out["flux_dn_dir_layer_base"]
                    )
            # Integrated fluxes (radsurf_urban_sw.F90:753-761)
            conv_diff = (
                dn_diff_below[..., :nd] - dn_diff_new
                - up_below[..., :nd] + up_above
            )
            int_flux_diff = matvec(int_diff, conv_diff)
            if with_direct:
                conv_dir = dn_dir_below[..., :nreg] - dn_dir_new
                int_flux_dir = matvec(int_dir, conv_dir)
                int_flux_diff = int_flux_diff + matvec(int_dir_diff, conv_dir)
            else:
                int_flux_dir = jnp.zeros((C, S, nreg), dtype)
            # Absorption (radsurf_urban_sw.F90:763-788)
            ifd = int_flux_diff.reshape(C, S, nreg, ns)
            ifd_mu = jnp.einsum("csrn,n->csr", ifd, 1.0 / mu,
                                precision="highest")
            out["clear_air_abs"] = ab_coef * (
                int_flux_dir[..., 0] + ifd_mu[..., 0]
            )
            if nreg > 1:
                veg_sum = jnp.sum(
                    (int_flux_dir[..., 1:] + ifd_mu[..., 1:]) * od_l[:, None, :],
                    axis=-1,
                )
                out["veg_air_abs"] = ab_coef * jnp.sum(
                    int_flux_dir[..., 1:] + ifd_mu[..., 1:], axis=-1
                )
                out["veg_abs"] = vb_coef * veg_sum
                if with_direct:
                    out["veg_abs_dir"] = vb_coef * jnp.sum(
                        int_flux_dir[..., 1:] * od_l[:, None, :], axis=-1
                    )
            # Wall fluxes (radsurf_urban_sw.F90:790-802, 955-963)
            if opt.do_urban:
                ifd_tan = jnp.einsum("csrn,n->csr", ifd, tan_s,
                                     precision="highest")
                wall_in = jnp.einsum("cr,csr->cs", fw, ifd_tan,
                                     precision="highest")
                if with_direct:
                    wall_in_dir = sin0[:, None] * jnp.einsum(
                        "cr,csr->cs", fw, int_flux_dir, precision="highest"
                    )
                    out["wall_in_dir"] = wall_in_dir
                    wall_in = wall_in + wall_in_dir
                out["wall_in"] = wall_in
                out["wall_net"] = wall_in * (1.0 - wa)
            # Sunlit fractions (radsurf_urban_sw.F90:804-848)
            if with_direct:
                roof_in_dir_t = jnp.take_along_axis(
                    roof_in_dir, itr[:, None], axis=-1
                )[..., 0]
                out["roof_sunlit_frac"] = _safe_div(
                    roof_in_dir_t * nbfa,
                    zcos * dn_dir_clear
                    * jnp.maximum(opt.min_building_fraction, rfrac),
                )
                dn_dir_clear = dn_dir_clear * nbf_l / nbfa
                int_dir_clear = jnp.where(
                    aet > 0.0,
                    dn_dir_clear * (1.0 - tdc) * zcos / jnp.where(
                        aet > 0.0, aet, 1.0),
                    dn_dir_clear * dz_l,
                )
                if nreg > 1:
                    vb_t = jnp.take_along_axis(
                        vb_coef, itr[:, None], axis=-1
                    )[..., 0]
                    veg_abs_dir_clear = int_dir_clear * vb_t * vfr
                    vad_t = jnp.take_along_axis(
                        out["veg_abs_dir"], itr[:, None], axis=-1
                    )[..., 0]
                    # Degenerate-region excision parity: below the
                    # min fraction the reference removes the veg region
                    # from the system entirely, so nothing is absorbed in
                    # it and its sunlit fraction is exactly 0
                    # (radsurf_urban_sw.F90 region handling); the masked
                    # dense path would otherwise return tiny/tiny ~ 1.
                    out["veg_sunlit_frac"] = jnp.where(
                        vfr >= opt.min_vegetation_fraction,
                        vad_t / jnp.maximum(eps, veg_abs_dir_clear),
                        0.0,
                    )
                if opt.do_urban:
                    wid_t = jnp.take_along_axis(
                        out["wall_in_dir"], itr[:, None], axis=-1
                    )[..., 0]
                    out["wall_sunlit_frac"] = 0.5 * wid_t / jnp.maximum(
                        eps, fwdc * sin0 * int_dir_clear
                    )
                dn_dir_clear = dn_dir_clear * tdc
            return (dn_dir_new, dn_diff_new, dn_dir_clear), out

        # Initial conditions at canopy top (radsurf_urban_sw.F90:687-700)
        dn_dir0 = jnp.zeros((C, S, nreg), dtype)
        dn_diff0 = jnp.zeros((C, S, nd), dtype)
        if with_direct:
            dn_dir0 = dn_dir0.at[..., 0].set(1.0 / zcos[:, None])
            dn_dir_clear0 = 1.0 / zcos
        else:
            dn_diff0 = dn_diff0.at[..., :ns].set(
                jnp.broadcast_to(hw_b, (C, S, ns))
            )
            dn_dir_clear0 = jnp.ones((C,), dtype)

        xs_sweep = (
            lay["R"].transpose(1, 0, 2, 3),
            lay["T"].transpose(1, 0, 2, 3),
            lay["E"].transpose(1, 0, 2, 3),
            lay["Sdn"].transpose(1, 0, 2, 3),
            lay["int_dir"].transpose(1, 0, 2, 3),
            lay["int_diff"].transpose(1, 0, 2, 3),
            lay["int_dir_diff"].transpose(1, 0, 2, 3),
            a_above_l, d_above_l, denom_l, a_below_l, d_below_l,
            geo["u_ov"].transpose(1, 0, 2, 3),
            geo["v_ov"].transpose(1, 0, 2, 3),
            geo["f_wall"].transpose(1, 0, 2),
            f_wall_dir_clear.transpose(1, 0),
            _pad_od(geo["od_scaling"]).transpose(1, 0, 2),
            air_abs_coef.transpose(1, 0, 2),
            veg_abs_coef.transpose(1, 0, 2),
            wall_albedo.transpose(1, 0, 2),
            inp.dz.transpose(1, 0),
            air_ext_t.transpose(1, 0),
            roof_fraction.transpose(1, 0),
            nbf.transpose(1, 0),
            nbf_above.transpose(1, 0),
            trans_dir_clear.transpose(1, 0),
            inp.veg_fraction.transpose(1, 0),
        )
        if opt.associative_sweeps:
            # Log-depth route: the downward recurrence is block-affine in
            # its carry; compose the per-layer maps by suffix associative
            # scan, then vmap down_step for the per-layer outputs.
            from ..ops.assoc_adding import (
                affine_down_carries,
                scalar_suffix_carries,
            )

            Tl = _unflat(xs_sweep[1], nd, nd)
            denom_u = _unflat(denom_l, nd, nd)
            v_reg = geo["v_ov"].transpose(1, 0, 2, 3)[..., :nreg, :]
            TVr = jnp.einsum(
                "lcsirn,lcrq->lcsiqn", Tl.reshape(L, C, S, nd, nreg, ns),
                v_reg, precision="highest",
            ).reshape(L, C, S, nd, nd)
            Cmap = solve(denom_u, TVr)
            if with_direct:
                Amap = jnp.einsum(
                    "lcspr,lcrw->lcspw", _unflat(xs_sweep[2], nreg, nreg),
                    v_reg, precision="highest",
                )
                SdnV = jnp.einsum(
                    "lcsip,lcpw->lcsiw", _unflat(xs_sweep[3], nd, nreg),
                    v_reg, precision="highest",
                )
                Bmap = solve(denom_u, matmul(
                    _unflat(xs_sweep[0], nd, nd),
                    matmul(_unflat(d_above_l, nd, nreg), Amap),
                ) + SdnV)
                cs = (nbf / nbf_above * trans_dir_clear).transpose(1, 0)
            else:
                Amap = jnp.broadcast_to(
                    jnp.eye(nreg, dtype=dtype), (L, C, S, nreg, nreg)
                )
                Bmap = jnp.zeros((L, C, S, nd, nreg), dtype)
                cs = jnp.ones((L, C), dtype)
            (dn_dir_in, dn_diff_in), (dn_dir_fin, dn_diff_fin) = (
                affine_down_carries(Amap, Bmap, Cmap, dn_dir0, dn_diff0)
            )
            dn_clear_in, dn_dir_clear_fin = scalar_suffix_carries(
                cs, dn_dir_clear0
            )
            _, outs = jax.vmap(down_step)(
                (dn_dir_in, dn_diff_in, dn_clear_in), xs_sweep
            )
        else:
            (dn_dir_fin, dn_diff_fin, dn_dir_clear_fin), outs = jax.lax.scan(
                down_step, (dn_dir0, dn_diff0, dn_dir_clear0), xs_sweep,
                reverse=True,
            )
        # Per-layer outputs come back stacked [L, C, ...] -> [C, L, ...]
        outs = {k: jnp.moveaxis(v, 0, 1) for k, v in outs.items()}
        # Ground fluxes (radsurf_urban_sw.F90:861-876)
        ground_dn_dir = zcos[:, None] * jnp.sum(dn_dir_fin, axis=-1)
        up_fin = matvec(a_ground, dn_diff_fin)
        if with_direct:
            up_fin = up_fin + matvec(d_ground, dn_dir_fin)
        ground_dn = jnp.sum(dn_diff_fin, axis=-1)
        if with_direct:
            ground_dn = ground_dn + ground_dn_dir
        outs["ground_dn"] = ground_dn
        outs["ground_net"] = ground_dn - jnp.sum(up_fin, axis=-1)
        tan_over_pi = jnp.asarray(np.tile(tan_s, nreg) / Pi, dtype)
        outs["ground_vertical_diff"] = jnp.einsum(
            "csj,j->cs", dn_diff_fin + up_fin, tan_over_pi, precision="highest"
        )
        if with_direct:
            outs["ground_dn_dir"] = ground_dn_dir
            gdd_t = jnp.take_along_axis(ground_dn_dir, itr[:, None], -1)[..., 0]
            outs["ground_sunlit_frac"] = _safe_div(
                gdd_t, zcos * dn_dir_clear_fin
            )
            outs["top_dn_dir"] = jnp.ones((C, S), dtype)
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = 1.0 - top_albedo_dir
        else:
            outs["top_dn_dir"] = jnp.zeros((C, S), dtype)
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = 1.0 - top_albedo_diff
        return outs

    norm_dir = sweep(with_direct=True)
    norm_diff = sweep(with_direct=False)
    return norm_dir, norm_diff, bc


def _pad_od(od_scaling):
    """[C, L, nreg-1] -> [C, L, max(nreg-1, 1)] (nreg=1: unused zeros)."""
    if od_scaling.shape[-1] == 0:
        return jnp.zeros(od_scaling.shape[:-1] + (1,), od_scaling.dtype)
    return od_scaling


def _use_pallas(opt: SolverOptions) -> bool:
    import os

    # An explicit opt value wins over the env force-override: the
    # custom_vjp backward pins use_pallas_factory=False (_xla_only) so
    # jax.grad works even under SPARTACUS_PALLAS=1 (the Pallas kernels
    # have no AD rule; the XLA path's VJP is the gradient).
    if opt.use_pallas_factory is not None:
        return opt.use_pallas_factory
    env = os.environ.get("SPARTACUS_PALLAS", "")
    if env != "":
        return env != "0"
    # Auto: only the real-TPU single-precision path (the kernel's index
    # arithmetic is i32; x64 mode traces Python ints as i64, which
    # Mosaic rejects, and double-precision data belongs on the XLA
    # path anyway), and only when the kernel's full VMEM bound — scratch
    # PLUS double-buffered pipeline windows (the round-2 crash was the
    # windows being omitted) — fits the per-kernel request cap.  The
    # pallas_call itself raises its Mosaic vmem_limit_bytes to the same
    # bound, so "guard passes" implies "kernel compiles".
    from ..ops.pallas_layer import VMEM_REQUEST_CAP, factory_vmem_bytes

    nd = opt.nreg * opt.nstream
    return (
        jax.default_backend() == "tpu"
        and not jax.config.jax_enable_x64
        and factory_vmem_bytes(nd, opt.nreg) * 1.25 <= VMEM_REQUEST_CAP
    )


def _use_pallas_sweeps(opt: SolverOptions, lg: LegendreGauss) -> bool:
    import os

    # Explicit opt value wins over the env override (see _use_pallas).
    if opt.use_pallas_sweeps is not None:
        return opt.use_pallas_sweeps
    env = os.environ.get("SPARTACUS_PALLAS_SWEEPS", "")
    if env != "":
        return env != "0"
    # Auto: real-TPU f32 only, and bound the VMEM footprint — the
    # a_below buffer is ((nreg+1)*ns)^2 rows of (8,128) tiles.
    return (
        jax.default_backend() == "tpu"
        and not jax.config.jax_enable_x64
        and (opt.nreg + 1) * lg.nstream <= 16
    )


def _flat(x):
    """Merge the trailing matrix dims for storage: [..., n, m] -> [..., n*m].

    TPU memory tiles the last TWO dims to (8, 128); storing small matrices
    (n, m <= 24) unflattened wastes up to ~16x HBM and bandwidth.  A single
    trailing axis of n*m pads only to the next multiple of 128.
    """
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _unflat(x, n, m):
    return x.reshape(x.shape[:-1] + (n, m))


def _tiled_gamma_prep(dz, C, S, L, dtype, factory_chunk):
    """Shared input prep for the fused tile-native factory path (SW + LW
    use identical padding conventions; a fix here fixes both).

    Returns (gbl, dz_bl, chunk_nb): gbl relays a [C, L, S, n, m] gamma
    stack into the kernel's flattened batch-major order [B(+pad), L, n*m],
    padding the C*S batch up to a TILE multiple with identity layers
    (gamma = -I, dz = 0 => expm = I exactly, so padding elements are
    no-ops); dz_bl is the matching padded [B(+pad), L] thickness; chunk_nb
    is factory_chunk converted from batch elements to whole kernel tiles.
    """
    from ..ops.pallas_layer import TILE

    B = C * S
    pad = (-B) % TILE

    def gbl(x, n, m):
        flat = _flat(x).transpose(0, 2, 1, 3).reshape(B, L, n * m)
        if pad:
            eye = jnp.broadcast_to(
                (-jnp.eye(n, m, dtype=dtype)).reshape(1, 1, n * m),
                (pad, L, n * m),
            )
            flat = jnp.concatenate([flat, eye], axis=0)
        return flat

    dz_bl = jnp.broadcast_to(dz[:, None, :], (C, S, L)).reshape(B, L)
    if pad:
        dz_bl = jnp.concatenate([dz_bl, jnp.zeros((pad, L), dtype)], axis=0)
    chunk_nb = max(1, factory_chunk // TILE) if factory_chunk else 0
    return gbl, dz_bl, chunk_nb


def _chunked_factory(fn, args, chunk: int):
    """Run the per-layer operator factory in column chunks via lax.map to
    bound its transient working set; outputs are returned flattened."""
    C = jax.tree_util.tree_leaves(args)[0].shape[0]
    if not chunk or C <= chunk or C % chunk != 0:
        return jax.tree_util.tree_map(_flat, fn(args))
    split = jax.tree_util.tree_map(
        lambda x: x.reshape((C // chunk, chunk) + x.shape[1:]), args
    )
    out = jax.lax.map(
        lambda a: jax.tree_util.tree_map(_flat, fn(a)), split
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((C,) + x.shape[2:]), out
    )


# ----------------------------------------------------------------------
# Pallas sweep path: phases 2+3 through ops/pallas_sweep.py kernels.
# Same math as the lax.scan path above; the clear-sky direct recurrence
# and sunlit fractions are evaluated in closed form (cumulative products
# over layers) instead of inside the scan.
# ----------------------------------------------------------------------

def _sw_pallas_path(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss,
                    geo, lay, zcos, sin0, with_profiles, tiled=False):
    from ..ops import pallas_sweep as PS

    nreg, ns = opt.nreg, lg.nstream
    nd = nreg * ns
    C, L = inp.dz.shape
    S = inp.air_ext.shape[-1]
    B = C * S
    dtype = inp.air_ext.dtype
    hw = tuple(float(x) for x in lg.hweight)
    rmu = tuple(1.0 / float(x) for x in lg.mu)
    rtan = tuple(float(x) for x in lg.tan_ang)
    pad = (-B) % PS.TILE
    interp = jax.default_backend() != "tpu"

    def bl(x):
        """[C, L, S, rows] -> [B(+pad), L, rows]."""
        x = x.transpose(0, 2, 1, 3).reshape(B, L, x.shape[-1])
        return PS._pad_b(x, pad)

    # tiled: lay entries are already raw kernel tiles [nb, L, rows, 8, 128]
    # from pallas_layer_tiles — hand them to the sweeps unchanged.
    lt = (lambda x: x) if tiled else bl

    def bls(x):
        """[C, L, S] -> [B(+pad), L, 1]."""
        return bl(x[..., None])

    def blc(x):
        """Per-column [C, L, rows] -> broadcast over S -> [B(+pad), L, rows]."""
        rows = x.shape[-1]
        x = jnp.broadcast_to(x[:, None], (C, S, L, rows)).reshape(B, L, rows)
        return PS._pad_b(x, pad)

    def bv(x, pad_value=0.0):
        """[C, S, rows] -> [B(+pad), rows]."""
        return PS._pad_b(x.reshape(B, x.shape[-1]), pad, pad_value)

    galb = inp.ground_albedo
    galb_dir = inp.ground_albedo_dir
    roof_alb = (
        inp.roof_albedo if opt.do_urban else jnp.zeros((C, L, S), dtype)
    )
    roof_alb_dir = (
        inp.roof_albedo_dir if opt.do_urban else jnp.zeros((C, L, S), dtype)
    )
    zcos_cs = jnp.broadcast_to(zcos[:, None], (C, S))
    grd_up = bv(jnp.stack([galb, galb_dir, zcos_cs], axis=-1), 1.0)
    uov = blc(_flat(geo["u_ov"]))
    vov = blc(_flat(geo["v_ov"]))

    stacks, top = PS.sw_up_sweep(
        lt(lay["R"]), lt(lay["T"]), lt(lay["E"]), lt(lay["Sup"]),
        lt(lay["Sdn"]), uov, vov, bls(roof_alb), bls(roof_alb_dir), grd_up,
        nd=nd, ns=ns, nreg=nreg, hw=hw, interpret=interp, tiled=tiled,
    )
    a_top = top[:B, : nd * nd].reshape(C, S, nd, nd)
    d_top = top[:B, nd * nd:].reshape(C, S, nd, nreg)
    hw_b = jnp.asarray(np.asarray(lg.hweight, dtype))
    top_albedo_diff = jnp.einsum(
        "csij,j->cs", a_top[..., :ns, :ns], hw_b, precision="highest"
    )
    top_albedo_dir = jnp.sum(d_top[..., :ns, 0], axis=-1) / zcos[:, None]
    bc = {"top_albedo_diff": top_albedo_diff, "top_albedo_dir": top_albedo_dir}

    # Aux scalar pack for the down sweeps
    air_abs_coef = inp.air_ext * (1.0 - inp.air_ssa)  # [C, L, S]
    veg_abs_coef = inp.veg_ext[..., None] * (1.0 - inp.veg_ssa)
    wall_albedo = (
        inp.wall_albedo if opt.do_urban else jnp.zeros((C, L, S), dtype)
    )
    nod = max(nreg - 1, 1)
    fw_b = jnp.broadcast_to(geo["f_wall"][:, None], (C, S, L, nreg))
    od_b = jnp.broadcast_to(
        _pad_od(geo["od_scaling"])[:, None], (C, S, L, nod)
    )
    aux = jnp.concatenate(
        [
            fw_b, od_b,
            air_abs_coef.transpose(0, 2, 1)[..., None],
            veg_abs_coef.transpose(0, 2, 1)[..., None],
            wall_albedo.transpose(0, 2, 1)[..., None],
        ],
        axis=-1,
    ).reshape(B, L, nreg + nod + 3)
    aux = PS._pad_b(aux, pad)
    grd_dn = bv(zcos_cs[..., None], 1.0)

    # BOTH normalizations in one fused kernel pass: each layer's operators
    # and stacks are read from HBM once instead of once per normalization.
    (outs_dir_bl, outs_diff_bl), (fin_dir, fin_diff) = PS.sw_down_sweep_both(
        lt(lay["R"]), lt(lay["T"]), lt(lay["E"]), lt(lay["Sdn"]),
        lt(lay["int_dir"]), lt(lay["int_diff"]), lt(lay["int_dir_diff"]),
        stacks, vov, aux, grd_dn,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        do_urban=opt.do_urban, with_profiles=with_profiles,
        interpret=interp, tiled=tiled,
    )

    def run_sweep(with_direct):
        outs_bl, fin = (
            (outs_dir_bl, fin_dir) if with_direct else (outs_diff_bl, fin_diff)
        )
        outs = {
            k: v[:B].reshape(C, S, L).transpose(0, 2, 1)
            for k, v in outs_bl.items()
        }
        if with_direct:
            dn_dir_fin = fin[:B, :nreg].reshape(C, S, nreg)
            dn_diff_fin = fin[:B, nreg:].reshape(C, S, nd)
        else:
            dn_dir_fin = jnp.zeros((C, S, nreg), dtype)
            dn_diff_fin = fin[:B].reshape(C, S, nd)
        return outs, dn_dir_fin, dn_diff_fin

    # Clear-sky direct recurrence in closed form
    # (radsurf_urban_sw.F90:804-848): suffix products over layers above
    itr = _itransp(inp.air_ext, inp.dz)
    air_ext_t = jnp.take_along_axis(
        inp.air_ext, itr[:, None, None], axis=-1
    )[..., 0]  # [C, L]
    bf_above = jnp.concatenate(
        [inp.building_fraction[:, 1:], jnp.zeros((C, 1), dtype)], axis=1
    )
    roof_fraction = jnp.maximum(0.0, inp.building_fraction - bf_above)
    nbf = 1.0 - inp.building_fraction
    nbf_above = 1.0 - bf_above
    tdc = jnp.exp(-air_ext_t * inp.dz / zcos[:, None])  # trans_dir_clear
    npw_sum = jnp.sum(geo["norm_perim_wall"], axis=-1)
    fwdc = jnp.where(
        nbf > opt.min_building_fraction,
        npw_sum / (Pi * jnp.maximum(nbf, opt.min_building_fraction)),
        0.0,
    )
    g_fac = (nbf / nbf_above) * tdc
    suffix = jnp.flip(jnp.cumprod(jnp.flip(g_fac, 1), axis=1), 1)  # P[l]
    c_in = (1.0 / zcos)[:, None] * jnp.concatenate(
        [suffix[:, 1:], jnp.ones((C, 1), dtype)], axis=1
    )
    c_mid = c_in * nbf / nbf_above
    int_dir_clear = jnp.where(
        air_ext_t > 0.0,
        c_mid * (1.0 - tdc) * zcos[:, None]
        / jnp.where(air_ext_t > 0.0, air_ext_t, 1.0),
        c_mid * inp.dz,
    )
    dn_dir_clear_fin = (1.0 / zcos) * suffix[:, 0]
    eps = jnp.finfo(dtype).eps

    def finalize(outs, dn_dir_fin, dn_diff_fin, with_direct):
        # Ground fluxes (radsurf_urban_sw.F90:861-876) without
        # materializing the [C,S,nd,nd] ground operators
        dsum = jnp.sum(dn_diff_fin.reshape(C, S, nreg, ns), axis=-1)
        up = galb[..., None, None] * hw_b * dsum[..., None]
        if with_direct:
            up = up + (
                (zcos[:, None] * galb_dir)[..., None, None]
                * hw_b * dn_dir_fin[..., None]
            )
        up_fin = up.reshape(C, S, nd)
        ground_dn_dir = zcos[:, None] * jnp.sum(dn_dir_fin, axis=-1)
        ground_dn = jnp.sum(dn_diff_fin, axis=-1)
        if with_direct:
            ground_dn = ground_dn + ground_dn_dir
        outs["ground_dn"] = ground_dn
        outs["ground_net"] = ground_dn - jnp.sum(up_fin, axis=-1)
        tan_over_pi = jnp.asarray(
            np.tile(np.asarray(lg.tan_ang, dtype), nreg) / Pi, dtype
        )
        outs["ground_vertical_diff"] = jnp.einsum(
            "csj,j->cs", dn_diff_fin + up_fin, tan_over_pi,
            precision="highest",
        )
        if with_direct:
            outs["ground_dn_dir"] = ground_dn_dir
            gdd_t = _take_spec(ground_dn_dir, itr)
            outs["ground_sunlit_frac"] = _safe_div(
                gdd_t, zcos * dn_dir_clear_fin
            )
            outs["roof_sunlit_frac"] = _safe_div(
                _take_spec(outs["roof_in_dir"], itr) * nbf_above,
                zcos[:, None] * c_in
                * jnp.maximum(opt.min_building_fraction, roof_fraction),
            )
            if nreg > 1:
                vb_t = _take_spec(veg_abs_coef, itr)
                veg_abs_dir_clear = (
                    int_dir_clear * vb_t * inp.veg_fraction
                )
                # Degenerate-region excision parity (see the scan path):
                # below min fraction the sunlit fraction is exactly 0.
                outs["veg_sunlit_frac"] = jnp.where(
                    inp.veg_fraction >= opt.min_vegetation_fraction,
                    _take_spec(
                        outs["veg_abs_dir"], itr
                    ) / jnp.maximum(eps, veg_abs_dir_clear),
                    0.0,
                )
            if opt.do_urban:
                outs["wall_sunlit_frac"] = 0.5 * _take_spec(
                    outs["wall_in_dir"], itr
                ) / jnp.maximum(eps, fwdc * sin0[:, None] * int_dir_clear)
            outs["top_dn_dir"] = jnp.ones((C, S), dtype)
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = 1.0 - top_albedo_dir
        else:
            outs["top_dn_dir"] = jnp.zeros((C, S), dtype)
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = 1.0 - top_albedo_diff
        return outs

    norm_dir = finalize(*run_sweep(True), with_direct=True)
    norm_diff = finalize(*run_sweep(False), with_direct=False)
    return norm_dir, norm_diff, bc


def _lw_pallas_path(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss,
                    geo, lay, wall_emissivity, roof_emissivity, roof_emission,
                    exposed_roof, emiss_reg, emiss_air, emiss_veg, emiss_wall,
                    with_profiles, tiled=False):
    from ..ops import pallas_sweep as PS

    nreg, ns = opt.nreg, lg.nstream
    nd = nreg * ns
    C, L = inp.dz.shape
    S = inp.air_ext.shape[-1]
    B = C * S
    dtype = inp.air_ext.dtype
    hw = tuple(float(x) for x in lg.hweight)
    rmu = tuple(1.0 / float(x) for x in lg.mu)
    rtan = tuple(float(x) for x in lg.tan_ang)
    pad = (-B) % PS.TILE
    interp = jax.default_backend() != "tpu"

    def bl(x):
        x = x.transpose(0, 2, 1, 3).reshape(B, L, x.shape[-1])
        return PS._pad_b(x, pad)

    def bls(x):
        return bl(x[..., None])

    def blc(x):
        rows = x.shape[-1]
        x = jnp.broadcast_to(x[:, None], (C, S, L, rows)).reshape(B, L, rows)
        return PS._pad_b(x, pad)

    geps = inp.ground_emissivity  # [C, S]
    gemit = inp.ground_emission
    frac0 = jnp.broadcast_to(
        geo["frac"][:, 0, :][:, None], (C, S, nreg)
    )
    grd_up = PS._pad_b(
        jnp.concatenate([geps[..., None], gemit[..., None], frac0], -1)
        .reshape(B, 2 + nreg),
        pad,
    )
    uov = blc(_flat(geo["u_ov"]))
    vov = blc(_flat(geo["v_ov"]))

    lt = (lambda x: x) if tiled else bl
    stacks, top = PS.lw_up_sweep(
        lt(lay["R"]), lt(lay["T"]), lt(lay["p"]), uov, vov,
        bls(roof_emissivity), bls(roof_emission),
        blc(exposed_roof[..., None]), grd_up,
        nd=nd, ns=ns, nreg=nreg, hw=hw, interpret=interp, tiled=tiled,
    )
    a_top = top[:B, : nd * nd].reshape(C, S, nd, nd)
    source_top = top[:B, nd * nd:].reshape(C, S, nd)
    hw_b = jnp.asarray(np.asarray(lg.hweight, dtype))
    top_emissivity = 1.0 - jnp.einsum(
        "csij,j->cs", a_top[..., :ns, :ns], hw_b, precision="highest"
    )
    top_emission = jnp.sum(source_top[..., :ns], axis=-1)
    bc = {"top_emissivity": top_emissivity, "top_emission": top_emission}

    air_abs_coef = inp.air_ext * (1.0 - inp.air_ssa)
    veg_abs_coef = inp.veg_ext[..., None] * (1.0 - inp.veg_ssa)
    nod = max(nreg - 1, 1)
    fw_b = jnp.broadcast_to(geo["f_wall"][:, None], (C, S, L, nreg))
    od_b = jnp.broadcast_to(
        _pad_od(geo["od_scaling"])[:, None], (C, S, L, nod)
    )
    dz_cs = inp.dz[:, :, None]  # [C, L, 1] broadcasting over S
    sub_air = emiss_reg[..., 0] * dz_cs
    sub_vegair = jnp.sum(emiss_air, -1) * dz_cs
    sub_veg = jnp.sum(emiss_veg, -1) * dz_cs
    sub_wall = emiss_wall * dz_cs

    def t1(x):  # [C, L, S] -> [C, S, L, 1]
        return x.transpose(0, 2, 1)[..., None]

    aux = jnp.concatenate(
        [
            fw_b, od_b, t1(air_abs_coef), t1(veg_abs_coef),
            t1(wall_emissivity), t1(sub_air), t1(sub_vegair), t1(sub_veg),
            t1(sub_wall),
        ],
        axis=-1,
    ).reshape(B, L, nreg + nod + 7)
    aux = PS._pad_b(aux, pad)

    # Both LW sweeps (internal, then incoming) in one fused kernel pass
    # (see the SW twin): operators/stacks read from HBM once.
    (outs_int_bl, outs_norm_bl), (fin_int, fin_norm) = PS.lw_down_sweep_both(
        lt(lay["R"]), lt(lay["T"]), lt(lay["p"]),
        lt(lay["int_diff"]), lt(lay["int_source"]),
        stacks, vov, aux,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        do_urban=opt.do_urban, with_profiles=with_profiles,
        interpret=interp, tiled=tiled,
    )

    def run_sweep(with_source):
        outs_bl, fin = (
            (outs_int_bl, fin_int) if with_source else (outs_norm_bl, fin_norm)
        )
        outs = {
            k: v[:B].reshape(C, S, L).transpose(0, 2, 1)
            for k, v in outs_bl.items()
        }
        dn_fin = fin[:B].reshape(C, S, nd)
        # Ground fluxes (radsurf_urban_lw.F90:806-828) without
        # materializing the ground operators
        dsum = jnp.sum(dn_fin.reshape(C, S, nreg, ns), axis=-1)
        up = (1.0 - geps)[..., None, None] * hw_b * dsum[..., None]
        if with_source:
            up = up + (
                gemit[..., None, None] * frac0[..., None] * hw_b
            )
        up_fin = up.reshape(C, S, nd)
        outs["ground_dn"] = jnp.sum(dn_fin, axis=-1)
        outs["ground_net"] = outs["ground_dn"] - jnp.sum(up_fin, axis=-1)
        tan_over_pi = jnp.asarray(
            np.tile(np.asarray(lg.tan_ang, dtype), nreg) / Pi, dtype
        )
        outs["ground_vertical_diff"] = jnp.einsum(
            "csj,j->cs", dn_fin + up_fin, tan_over_pi, precision="highest"
        )
        if with_source:
            outs["top_dn"] = jnp.zeros((C, S), dtype)
            outs["top_net"] = -top_emission
        else:
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = top_emissivity
        return outs

    return run_sweep(True), run_sweep(False), bc


# ----------------------------------------------------------------------
# Longwave solver
# ----------------------------------------------------------------------

def _spartacus_lw_impl(inp: CanopyInputs, opt: SolverOptions,
                       lg: LegendreGauss, with_profiles: bool = False):
    """Longwave solve for one column group.

    Returns (internal, norm, bc): `internal` holds fluxes from emission
    within the canopy, `norm` the fluxes normalized by unit top-of-canopy
    downwelling, and bc = {"top_emissivity", "top_emission"} [C, S].
    Parity: radsurf/radsurf_urban_lw.F90:35-883 (forest =
    radsurf_forest_lw.F90 via building_fraction = 0).
    """
    nreg, ns = opt.nreg, lg.nstream
    nd = nreg * ns
    C, L = inp.dz.shape
    S = inp.air_ext.shape[-1]
    dtype = inp.air_ext.dtype
    mu = np.asarray(lg.mu, dtype)
    hw = np.asarray(lg.hweight, dtype)
    tan_s = np.asarray(lg.tan_ang, dtype)
    hw_b = jnp.asarray(hw, dtype)

    geo = _prepare_geometry(inp, opt, lg, lw=True)
    frac = geo["frac"]

    # Wall factors (radsurf_urban_lw.F90:384-392): walls fully intercept;
    # the reference uses the band-1 wall emissivity for the scattering factor
    # (wall_factor = 1 - wall_emissivity(1,:), a quirk); we use the full
    # spectral emissivity (identical for nlw = 1, the only supported case of
    # the reference's simple spectrum).
    if opt.do_urban:
        wall_ext = jnp.ones((C, L, S), dtype)
        wall_factor = 1.0 - inp.wall_emissivity
        wall_emissivity = inp.wall_emissivity
        wall_emission = inp.wall_emission
        roof_emissivity = inp.roof_emissivity
        roof_emission = inp.roof_emission
    else:
        wall_ext = jnp.ones((C, L, S), dtype)
        wall_factor = jnp.zeros((C, L, S), dtype)
        wall_emissivity = jnp.ones((C, L, S), dtype)
        wall_emission = jnp.zeros((C, L, S), dtype)
        roof_emissivity = jnp.ones((C, L, S), dtype)
        roof_emission = jnp.zeros((C, L, S), dtype)

    ext_reg, ssa_reg, planck_reg = G.region_optics_lw(
        inp.air_ext, inp.air_ssa, inp.clear_air_planck,
        inp.veg_ext, inp.veg_ssa, inp.veg_planck, inp.veg_air_planck,
        geo["od_scaling"], nreg,
    )
    _, g1m, g2m, _ = G.assemble_gammas(
        ext_reg, ssa_reg, geo["f_exchange"], geo["f_wall"],
        wall_ext, wall_factor, lg, nreg,
    )
    em = G.emission_rates(
        ext_reg, ssa_reg, planck_reg, frac, geo["norm_perim_wall"],
        wall_emission, lg, nreg,
    )
    dz_b = jnp.broadcast_to(inp.dz[:, :, None], (C, L, S))

    use_pf = _use_pallas(opt)
    use_ps = _use_pallas_sweeps(opt, lg) and not opt.associative_sweeps
    lw_tiled = use_pf and use_ps
    if lw_tiled:
        # Fused tile-native path (see the SW twin above): one gamma
        # relayout in, raw tiles out, zero factory->sweep copies.
        from ..ops.pallas_layer import pallas_lw_layer_tiles

        gbl, dz_bl, chunk_nb = _tiled_gamma_prep(
            inp.dz, C, S, L, dtype, opt.factory_chunk
        )
        lay = pallas_lw_layer_tiles(
            gbl(g1m, nd, nd), gbl(g2m, nd, nd),
            gbl(em["emiss_rate"][..., None], nd, 1), dz_bl,
            nd=nd, n_double=opt.n_double, chunk_nb=chunk_nb,
        )
    else:
        if use_pf:
            from ..ops.pallas_layer import pallas_lw_layer_matrices

            lw_factory_fn = pallas_lw_layer_matrices
        else:
            lw_factory_fn = lw_layer_matrices

        def _lw_factory(a):
            g1a, g2a, ema, dza = a
            out = lw_factory_fn(g1a, g2a, ema, dza, n_double=opt.n_double)
            # keep vector outputs unflattened; _chunked_factory flattens the
            # trailing TWO dims, so lift vectors to [..., n, 1] first
            out["p"] = out["p"][..., None]
            out["int_source"] = out["int_source"][..., None]
            return out

        lay = _chunked_factory(
            _lw_factory, (g1m, g2m, em["emiss_rate"], dz_b),
            opt.factory_chunk
        )

    # Emission bookkeeping (radsurf_urban_lw.F90:446-477)
    emiss_factor = 2.0 * float(np.sum(hw / mu))
    emiss_reg = emiss_factor * em["volume_emiss"]  # [C, L, S, nreg]
    if nreg > 1:
        air_src = (
            inp.air_ext * (1.0 - inp.air_ssa) * inp.veg_air_planck
        )  # clear-air properties (radsurf_urban_lw.F90:466-469)
        emiss_air = emiss_factor * frac[..., None, 1:] * air_src[..., None]
        emiss_veg = (
            emiss_factor
            * frac[..., None, 1:]
            * (inp.veg_ext[..., None] * (1.0 - inp.veg_ssa))[..., None]
            * inp.veg_planck[..., None]
            * geo["od_scaling"][..., None, :]
        )
    else:
        emiss_air = emiss_veg = jnp.zeros((C, L, S, 1), dtype)
    emiss_wall = (
        jnp.sum(geo["norm_perim_wall"], axis=-1)[..., None]
        * lg.vadjustment
        * wall_emission
    )  # [C, L, S]

    # Ground operators (radsurf_urban_lw.F90:551-565)
    block = np.zeros((nreg, ns, nreg, ns))
    for r in range(nreg):
        block[r, :, r, :] = 1.0
    same_reg = jnp.asarray(
        (block * hw[None, :, None, None]).reshape(nd, nd), dtype
    )
    a_ground = (1.0 - inp.ground_emissivity)[:, :, None, None] * same_reg
    src_block = np.zeros((nreg, ns))
    src_block[:, :] = hw
    src_shape = jnp.asarray(src_block.reshape(nd), dtype)
    frac0 = frac[:, 0, :]  # lowest-layer fractions
    source_ground = (
        inp.ground_emission[:, :, None]
        * jnp.repeat(frac0, ns, axis=-1)[:, None, :]
        * src_shape
    )  # [C, S, nd]

    # Exposed-roof fraction at the top of each layer
    # (radsurf_urban_lw.F90:589-599; padding makes the top-of-canopy case
    # automatic).  building_fraction is zeros for forest (_sanitize_forest).
    bf_above = jnp.concatenate(
        [inp.building_fraction[:, 1:], jnp.zeros((C, 1), dtype)], axis=1
    )
    exposed_roof = jnp.maximum(0.0, inp.building_fraction - bf_above)

    if use_ps:
        return _lw_pallas_path(
            inp, opt, lg, geo, lay, wall_emissivity, roof_emissivity,
            roof_emission, exposed_roof, emiss_reg, emiss_air, emiss_veg,
            emiss_wall, with_profiles, tiled=lw_tiled,
        )

    def up_step(carry, x):
        a_above, source_above = carry
        Rf, Tf, p, u_ov, v_ov, reps, remit, exposed = x
        R = _unflat(Rf, nd, nd)
        T = _unflat(Tf, nd, nd)
        eye = jnp.eye(nd, dtype=dtype)
        denom = eye - matmul(a_above, R)
        at = solve(denom, matmul(a_above, T))
        a_below_reg = R + matmul(T, at)
        # Eq. 34 (radsurf_urban_lw.F90:583-587)
        src_rhs = solve(denom, source_above + matvec(a_above, p))
        source_below_reg = p + matvec(T, src_rhs)
        a_roof = ((1.0 - reps)[:, :, None, None] * hw[:, None]) * jnp.ones(
            (ns, ns), dtype
        )
        source_roof = (remit * exposed[:, None])[:, :, None] * hw  # [C,S,ns]
        a_below = jnp.zeros((C, S, (nreg + 1) * ns, (nreg + 1) * ns), dtype)
        a_below = a_below.at[..., :nd, :nd].set(a_below_reg)
        a_below = a_below.at[..., nd:, nd:].set(a_roof)
        source_below = jnp.concatenate([source_below_reg, source_roof], -1)
        a_above_new = _u_mat_v(u_ov, a_below, v_ov, ns)
        source_above_new = _u_vec(u_ov, source_below, ns)
        ys = (_flat(a_above), source_above, _flat(denom), _flat(a_below),
              source_below)
        return (a_above_new, source_above_new), ys

    xs = (
        lay["R"].transpose(1, 0, 2, 3),
        lay["T"].transpose(1, 0, 2, 3),
        lay["p"].transpose(1, 0, 2, 3),
        geo["u_ov"].transpose(1, 0, 2, 3),
        geo["v_ov"].transpose(1, 0, 2, 3),
        roof_emissivity.transpose(1, 0, 2),
        roof_emission.transpose(1, 0, 2),
        exposed_roof.transpose(1, 0),
    )
    if opt.associative_sweeps:
        # Log-depth route (see the SW twin above): emission rides as a
        # width-1 source channel through the same star composition.
        from ..ops.assoc_adding import (
            ground_star_element,
            lw_layer_star_elements,
            star_prefix,
        )

        elems = lw_layer_star_elements(
            _unflat(xs[0], nd, nd), _unflat(xs[1], nd, nd), xs[2],
            xs[3], xs[4],
            (1.0 - xs[5])[..., None, None]
            * (hw[:, None] * jnp.ones((ns, ns), dtype)),
            (xs[6] * xs[7][..., None])[..., None] * jnp.asarray(hw, dtype),
            nreg, ns,
        )
        prefix = star_prefix(
            elems,
            ground_star_element(a_ground, source_ground[..., None], 1),
        )
        a_top, source_top = prefix["Rd"][-1], prefix["Su"][-1][..., 0]
        _, ys = jax.vmap(up_step)(
            (prefix["Rd"][:-1], prefix["Su"][:-1, ..., 0]), xs
        )
    else:
        (a_top, source_top), ys = jax.lax.scan(
            up_step, (a_ground, source_ground), xs
        )
    a_above_l, source_above_l, denom_l, a_below_l, source_below_l = ys

    # Top-of-canopy boundary conditions (radsurf_urban_lw.F90:629-637)
    top_emissivity = 1.0 - jnp.einsum(
        "csij,j->cs", a_top[..., :ns, :ns], hw_b, precision="highest"
    )
    top_emission = jnp.sum(source_top[..., :ns], axis=-1)
    bc = {"top_emissivity": top_emissivity, "top_emission": top_emission}

    air_abs_coef = inp.air_ext * (1.0 - inp.air_ssa)
    veg_abs_coef = inp.veg_ext[..., None] * (1.0 - inp.veg_ssa)

    def sweep(with_source: bool):
        def down_step(carry, x):
            dn = carry
            (Rf, Tf, p, int_difff, int_source, a_abovef, source_above,
             denomf, a_belowf, source_below, u_ov, v_ov, fw, od_l, ab_coef,
             vb_coef, weps, er, ea, ev, ew, dz_l) = x
            R = _unflat(Rf, nd, nd)
            T = _unflat(Tf, nd, nd)
            int_diff = _unflat(int_difff, nd, nd)
            a_above = _unflat(a_abovef, nd, nd)
            denom = _unflat(denomf, nd, nd)
            a_below = _unflat(a_belowf, (nreg + 1) * ns, (nreg + 1) * ns)
            dn_below = _ov_vec(v_ov, dn, ns)  # [C, S, (nreg+1)ns]
            up_below = matvec(a_below, dn_below)
            if with_source:
                up_below = up_below + source_below
            out = {}
            out["roof_in"] = jnp.sum(dn_below[..., nd:], axis=-1)
            out["roof_net"] = out["roof_in"] - jnp.sum(
                up_below[..., nd:], axis=-1
            )
            if with_source:
                rhs = (
                    matvec(T, dn_below[..., :nd])
                    + matvec(R, source_above) + p
                )
            else:
                rhs = matvec(T, dn_below[..., :nd])
            dn_new = solve(denom, rhs)
            up_above = matvec(a_above, dn_new)
            if with_source:
                up_above = up_above + source_above
            if with_profiles:
                out["flux_dn_layer_top"] = jnp.sum(dn_below[..., :nd], -1)
                out["flux_up_layer_top"] = jnp.sum(up_below[..., :nd], -1)
                out["flux_dn_layer_base"] = jnp.sum(dn_new, -1)
                out["flux_up_layer_base"] = jnp.sum(up_above, -1)
            conv = dn_below[..., :nd] - dn_new - up_below[..., :nd] + up_above
            int_flux = matvec(int_diff, conv)
            if with_source:
                int_flux = int_flux + int_source
            iflux = int_flux.reshape(C, S, nreg, ns)
            if_mu = jnp.einsum("csrn,n->csr", iflux, 1.0 / mu,
                               precision="highest")
            out["clear_air_abs"] = ab_coef * if_mu[..., 0]
            if nreg > 1:
                out["veg_air_abs"] = ab_coef * jnp.sum(if_mu[..., 1:], -1)
                out["veg_abs"] = vb_coef * jnp.sum(
                    if_mu[..., 1:] * od_l[:, None, :], -1
                )
            if with_source:
                out["clear_air_abs"] = out["clear_air_abs"] - er[..., 0] * dz_l[:, None]
                if nreg > 1:
                    out["veg_air_abs"] = out["veg_air_abs"] - jnp.sum(
                        ea, -1) * dz_l[:, None]
                    out["veg_abs"] = out["veg_abs"] - jnp.sum(
                        ev, -1) * dz_l[:, None]
            if opt.do_urban:
                if_tan = jnp.einsum("csrn,n->csr", iflux, tan_s,
                                    precision="highest")
                wall_in = jnp.einsum("cr,csr->cs", fw, if_tan,
                                     precision="highest")
                out["wall_in"] = wall_in
                wall_net = wall_in * weps
                if with_source:
                    wall_net = wall_net - ew * dz_l[:, None]
                out["wall_net"] = wall_net
            return dn_new, out

        dn0 = jnp.zeros((C, S, nd), dtype)
        if not with_source:
            dn0 = dn0.at[..., :ns].set(jnp.broadcast_to(hw_b, (C, S, ns)))

        xs_sweep = (
            lay["R"].transpose(1, 0, 2, 3),
            lay["T"].transpose(1, 0, 2, 3),
            lay["p"].transpose(1, 0, 2, 3),
            lay["int_diff"].transpose(1, 0, 2, 3),
            lay["int_source"].transpose(1, 0, 2, 3),
            a_above_l, source_above_l, denom_l, a_below_l, source_below_l,
            geo["u_ov"].transpose(1, 0, 2, 3),
            geo["v_ov"].transpose(1, 0, 2, 3),
            geo["f_wall"].transpose(1, 0, 2),
            _pad_od(geo["od_scaling"]).transpose(1, 0, 2),
            air_abs_coef.transpose(1, 0, 2),
            veg_abs_coef.transpose(1, 0, 2),
            wall_emissivity.transpose(1, 0, 2),
            emiss_reg.transpose(1, 0, 2, 3),
            emiss_air.transpose(1, 0, 2, 3),
            emiss_veg.transpose(1, 0, 2, 3),
            emiss_wall.transpose(1, 0, 2),
            inp.dz.transpose(1, 0),
        )
        if opt.associative_sweeps:
            # Log-depth route: affine carry maps with the emission constant
            # in the B slot over a frozen width-1 channel pinned at 1.
            from ..ops.assoc_adding import affine_down_carries

            Tl = _unflat(xs_sweep[1], nd, nd)
            denom_u = _unflat(denom_l, nd, nd)
            v_reg = geo["v_ov"].transpose(1, 0, 2, 3)[..., :nreg, :]
            TVr = jnp.einsum(
                "lcsirn,lcrq->lcsiqn", Tl.reshape(L, C, S, nd, nreg, ns),
                v_reg, precision="highest",
            ).reshape(L, C, S, nd, nd)
            Cmap = solve(denom_u, TVr)
            if with_source:
                Bmap = solve(denom_u, matvec(
                    _unflat(xs_sweep[0], nd, nd), source_above_l
                ) + xs_sweep[2])[..., None]
            else:
                Bmap = jnp.zeros((L, C, S, nd, 1), dtype)
            Amap = jnp.ones((L, C, S, 1, 1), dtype)
            one0 = jnp.ones((C, S, 1), dtype)
            (_, dn_in), (_, dn_fin) = affine_down_carries(
                Amap, Bmap, Cmap, one0, dn0
            )
            _, outs = jax.vmap(down_step)(dn_in, xs_sweep)
        else:
            dn_fin, outs = jax.lax.scan(
                down_step, dn0, xs_sweep, reverse=True
            )
        outs = {k: jnp.moveaxis(v, 0, 1) for k, v in outs.items()}
        up_fin = matvec(a_ground, dn_fin)
        if with_source:
            up_fin = up_fin + source_ground
        outs["ground_dn"] = jnp.sum(dn_fin, axis=-1)
        outs["ground_net"] = outs["ground_dn"] - jnp.sum(up_fin, axis=-1)
        tan_over_pi = jnp.asarray(np.tile(tan_s, nreg) / Pi, dtype)
        outs["ground_vertical_diff"] = jnp.einsum(
            "csj,j->cs", dn_fin + up_fin, tan_over_pi, precision="highest"
        )
        if with_source:
            outs["top_dn"] = jnp.zeros((C, S), dtype)
            outs["top_net"] = -top_emission
        else:
            outs["top_dn"] = jnp.ones((C, S), dtype)
            outs["top_net"] = top_emissivity
        return outs

    internal = sweep(with_source=True)
    norm = sweep(with_source=False)
    return internal, norm, bc


# ----------------------------------------------------------------------
# Public entry points: optional column chunking around the impls
# ----------------------------------------------------------------------

# Per-field no-op padding values for chunk-rounding extra columns: scales
# must stay positive (they divide perimeter formulas) and cos_sza nonzero
# (it divides the direct normalization); everything else pads with zero.
_PAD_VALUES = {"cos_sza": 1.0, "veg_scale": 1.0, "building_scale": 1.0}


def _pad_columns(inp: CanopyInputs, pad: int) -> CanopyInputs:
    if pad == 0:
        return inp
    from dataclasses import fields, replace

    kw = {}
    for f in fields(inp):
        x = getattr(inp, f.name)
        if x is None:
            continue
        fill = _PAD_VALUES.get(f.name, 0.0)
        extra = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        kw[f.name] = jnp.concatenate([jnp.asarray(x), extra], axis=0)
    return replace(inp, **kw)


# AUTO column-chunk target (measured optimum on v5e, round 4: 2048-column
# chunks beat both the unchunked whole batch and smaller 512 chunks; see
# SolverOptions.column_chunk).
_AUTO_COLUMN_CHUNK = 2048


def _resolve_column_chunk(opt: SolverOptions, lg, C: int, S: int = 1) -> int:
    """Resolve the column_chunk sentinel: -1 = AUTO picks an even split
    near the measured optimum on the fused kernel path, no chunking
    elsewhere.  The optimum is ~2048 columns for few-band runs and ~8k
    flattened C*S batch elements for multiband (v5e, round 4: rami5's
    62-layer x 14-band shape runs 4.2k cols/s unchunked, 6.1k at
    512-column chunks; 2048/8 = 2.18M vs 1.70M on the 1-band headline)."""
    ck = opt.column_chunk
    if ck != -1:
        return ck
    target = min(_AUTO_COLUMN_CHUNK, max(1, 8192 // max(S, 1)))
    if C <= target or not (_use_pallas(opt) and _use_pallas_sweeps(opt, lg)):
        return 0
    n_chunks = -(-C // target)
    return -(-C // n_chunks)


def _chunked_solve(impl, inp, opt, lg, with_profiles):
    C = inp.dz.shape[0]
    ck = _resolve_column_chunk(opt, lg, C, inp.air_ext.shape[-1])
    if not ck or C <= ck:
        return impl(inp, opt, lg, with_profiles)
    pad = (-C) % ck
    inp_p = _pad_columns(inp, pad)
    n_chunks = (C + pad) // ck
    split = jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, (n_chunks, ck) + x.shape[1:]), inp_p
    )
    out = jax.lax.map(lambda a: impl(a, opt, lg, with_profiles), split)
    return jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, (n_chunks * ck,) + x.shape[2:])[:C], out
    )


# Differentiability of the Pallas path: the hand-written kernels have no
# automatic VJP, but they compute the same function as the XLA path to f32
# rounding, so the XLA path's VJP IS the gradient.  custom_vjp: primal =
# Pallas kernels, backward = jax.vjp of the XLA path (recomputes the
# primal there — paid only when differentiating).

def _xla_only(opt: SolverOptions) -> SolverOptions:
    from dataclasses import replace

    return replace(opt, use_pallas_factory=False, use_pallas_sweeps=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _sw_diff(inp, opt, lg, with_profiles):
    return _spartacus_sw_impl(inp, opt, lg, with_profiles)


def _sw_diff_fwd(inp, opt, lg, with_profiles):
    return _sw_diff(inp, opt, lg, with_profiles), inp


def _sw_diff_bwd(opt, lg, with_profiles, inp, ct):
    _, vjp = jax.vjp(
        lambda a: _spartacus_sw_impl(a, _xla_only(opt), lg, with_profiles),
        inp,
    )
    return vjp(ct)


_sw_diff.defvjp(_sw_diff_fwd, _sw_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _lw_diff(inp, opt, lg, with_profiles):
    return _spartacus_lw_impl(inp, opt, lg, with_profiles)


def _lw_diff_fwd(inp, opt, lg, with_profiles):
    return _lw_diff(inp, opt, lg, with_profiles), inp


def _lw_diff_bwd(opt, lg, with_profiles, inp, ct):
    _, vjp = jax.vjp(
        lambda a: _spartacus_lw_impl(a, _xla_only(opt), lg, with_profiles),
        inp,
    )
    return vjp(ct)


_lw_diff.defvjp(_lw_diff_fwd, _lw_diff_bwd)


def _coerce_dtype(inp: CanopyInputs) -> CanopyInputs:
    """Cast every array field to ONE working dtype (air_ext's).

    Mixed-precision inputs (e.g. f32 optics with f64 Planck emissions)
    would otherwise make the adding-scan carry dtypes diverge mid-solve
    (jax.lax.scan requires carry-in == carry-out types) and silently
    promote parts of the f32 fast path to f64."""
    from dataclasses import fields, replace

    dtype = jnp.asarray(inp.air_ext).dtype
    kw = {}
    for f in fields(inp):
        x = getattr(inp, f.name)
        if x is None:
            continue
        xa = jnp.asarray(x)
        if xa.dtype != dtype:
            kw[f.name] = xa.astype(dtype)
    return replace(inp, **kw) if kw else inp


def _sanitize_forest(inp: CanopyInputs, opt: SolverOptions) -> CanopyInputs:
    """Forest solves must ignore building inputs entirely (the reference's
    forest solvers never read them, radsurf_forest_sw.F90:226-234): input
    files may carry -1 sentinels in building_fraction for forest columns,
    which would otherwise corrupt region fractions, perimeters, roof
    fractions and the clear-sky sunlit recurrences.  Zeroing ONCE here
    keeps every downstream path (XLA scan, Pallas factory, Pallas sweeps)
    consistent."""
    if opt.do_urban or inp.building_fraction is None:
        return inp
    from dataclasses import replace

    return replace(
        inp, building_fraction=jnp.zeros_like(inp.building_fraction)
    )


@functools.partial(jax.jit, static_argnames=("opt", "lg", "with_profiles"))
def spartacus_sw(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss,
                 with_profiles: bool = False):
    """Shortwave solve; see _spartacus_sw_impl.  Honors opt.column_chunk;
    reverse-mode differentiable on both the XLA and Pallas paths."""
    impl = (
        _sw_diff if (_use_pallas(opt) or _use_pallas_sweeps(opt, lg))
        else _spartacus_sw_impl
    )
    return _chunked_solve(impl, _coerce_dtype(_sanitize_forest(inp, opt)),
                          opt, lg, with_profiles)


@functools.partial(jax.jit, static_argnames=("opt", "lg", "with_profiles"))
def spartacus_lw(inp: CanopyInputs, opt: SolverOptions, lg: LegendreGauss,
                 with_profiles: bool = False):
    """Longwave solve; see _spartacus_lw_impl.  Honors opt.column_chunk;
    reverse-mode differentiable on both the XLA and Pallas paths."""
    impl = (
        _lw_diff if (_use_pallas(opt) or _use_pallas_sweeps(opt, lg))
        else _spartacus_lw_impl
    )
    return _chunked_solve(impl, _coerce_dtype(_sanitize_forest(inp, opt)),
                          opt, lg, with_profiles)
