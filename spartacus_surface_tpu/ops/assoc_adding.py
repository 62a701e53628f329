"""Log-depth (associative-scan) adding method for deep canopies.

The sequential upward adding recurrence (solver phase 2,
radsurf/radsurf_urban_sw.F90:604-654, radsurf_urban_lw.F90:567-614) and the
downward flux recurrence (phase 3, radsurf_urban_sw.F90:676-1001) both have
O(nlay) dependency depth.  For the reference's canopies (<= 62 layers) the
batched lax.scan path keeps the chip saturated and depth is irrelevant; for
very deep profiles at small batch (e.g. profile-resolved LES canopies with
hundreds of layers), the layer chain becomes the critical path.  This module
provides O(log nlay)-depth equivalents (ROADMAP capability item 4):

* The upward interface-operator build is a prefix composition under the
  Redheffer star product: each (layer + its top-interface overlap) is a
  two-sided scattering element (Rd, Td, Ru, Tu, E, Su, Sd), composition of
  vertically adjacent slabs is associative, and jax.lax.associative_scan
  evaluates all ground-up prefixes in ceil(log2 L) combine rounds.  The
  sequential carry is recovered exactly: a_above = Rd(prefix),
  d_above / source_above = Su(prefix).
* The downward flux recurrence is affine in its carry: each layer is a
  block-lower-triangular map (dn_dir, dn_diff) -> (A dn_dir,
  B dn_dir + C dn_diff); suffix composition of (A, B, C) triples is again
  associative.  The LW emission constant rides in the B slot with a frozen
  length-1 "direct" channel pinned at 1.

Cost model: one star combine is ~3x one sequential adding step and the scan
performs ~2L combines, so the parallel path trades ~4-6x FLOPs for
L/log2(L) less depth — profitable only when depth, not throughput, binds.
Enabled by SolverOptions.associative_sweeps; parity with the lax.scan path
is exercised in tests/test_associative.py.

Element conventions (layer axis leads: [L, C, S, ...]).  For a slab with
downwelling d_top incident on its top face, upwelling u_bot incident on its
bottom face, and direct beam e_top at its top:

    u_top = Rd d_top + Tu u_bot + Su e_top
    d_bot = Td d_top + Ru u_bot + Sd e_top
    e_bot = E  e_top

Each layer element folds in its TOP-interface region overlap (u_ov
[L, C, nreg, nreg+1] below->above, v_ov [L, C, nreg+1, nreg] above->below;
radsurf_overlap.F90 conventions) and the exposed-roof rows, so adjacent
elements meet in matching region bases and compose directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .matrix import matmul, matvec, solve

_KEYS = ("Rd", "Td", "Ru", "Tu", "E", "Su", "Sd")
_HI = "highest"


def star_combine(lo, hi):
    """Compose slab `hi` stacked on top of slab `lo` (Redheffer star).

    Both are dicts with keys Rd/Td/Ru/Tu ([..., n, n]), E ([..., p, p]) and
    Su/Sd ([..., n, p]); the direct/source channel width p is arbitrary
    (nreg for SW, 1 for LW emission).  One solve serves all three
    right-hand sides.  Associative by construction.
    """
    Rd_a, Td_a, Ru_a, Tu_a, E_a, Su_a, Sd_a = (hi[k] for k in _KEYS)
    Rd_b, Td_b, Ru_b, Tu_b, E_b, Su_b, Sd_b = (lo[k] for k in _KEYS)
    n = Rd_a.shape[-1]
    eye = jnp.eye(n, dtype=Rd_a.dtype)
    M = eye - matmul(Ru_a, Rd_b)
    SuE = matmul(Su_b, E_a)
    s = Sd_a + matmul(Ru_a, SuE)
    sol = solve(M, jnp.concatenate([Td_a, Ru_a, s], axis=-1))
    X = sol[..., :n]          # M^-1 Td_a
    W = sol[..., n:2 * n]     # M^-1 Ru_a
    sm = sol[..., 2 * n:]     # M^-1 s
    WTu_b = matmul(W, Tu_b)
    return {
        "Rd": Rd_a + matmul(Tu_a, matmul(Rd_b, X)),
        "Td": matmul(Td_b, X),
        "Ru": Ru_b + matmul(Td_b, WTu_b),
        "Tu": matmul(Tu_a, Tu_b + matmul(Rd_b, WTu_b)),
        "E": matmul(E_b, E_a),
        "Su": Su_a + matmul(Tu_a, SuE + matmul(Rd_b, sm)),
        "Sd": matmul(Sd_b, E_a) + matmul(Td_b, sm),
    }


def ground_star_element(a_ground, d_ground, p):
    """Absorbing lower-boundary element: reflects with a_ground, responds to
    the direct/source channel with d_ground ([..., nd, p]); transmits
    nothing (Td/Ru/Tu/E/Sd = 0)."""
    z_nn = jnp.zeros_like(a_ground)
    batch = a_ground.shape[:-2]
    return {
        "Rd": a_ground,
        "Td": z_nn,
        "Ru": z_nn,
        "Tu": z_nn,
        "E": jnp.zeros(batch + (p, p), a_ground.dtype),
        "Su": d_ground,
        "Sd": jnp.zeros_like(d_ground),
    }


def star_prefix(elements, ground):
    """All ground-up prefix compositions in O(log L) combine rounds.

    elements: dict of [L, ...] per-layer star elements (bottom layer
    first); ground: element without the layer axis.  Returns a dict of
    [L+1, ...]: prefix[i] = layers 0..i-1 composed over the ground — the
    sequential carry ENTERING layer i — and prefix[L] is the full
    top-of-canopy composite.
    """
    elems = {
        k: jnp.concatenate([ground[k][None], elements[k]], axis=0)
        for k in _KEYS
    }
    return jax.lax.associative_scan(star_combine, elems, axis=0)


def affine_down_carries(A, B, C, dn_dir0, dn_diff0):
    """Per-interface carries of the downward affine recurrence, log-depth.

    The sequential sweep runs top-down (layer L-1 first) with
    dn_dir' = A_l dn_dir and dn_diff' = B_l dn_dir + C_l dn_diff.  Suffix
    composites are built by associative_scan on flipped arrays and applied
    to the top-of-canopy carry.  Returns ((dn_dir_in, dn_diff_in)
    [L, ...] carry-ins per layer, (dn_dir_fin, dn_diff_fin) at the
    ground).
    """

    def comp(a, b):
        # a = maps applied first (nearer the canopy top), b = after;
        # returns b o a.  Associative: fn(fn(a,b),c) = c o b o a.
        return {
            "A": matmul(b["A"], a["A"]),
            "B": matmul(b["B"], a["A"]) + matmul(b["C"], a["B"]),
            "C": matmul(b["C"], a["C"]),
        }

    flipped = {
        "A": jnp.flip(A, 0), "B": jnp.flip(B, 0), "C": jnp.flip(C, 0)
    }
    suffix = jax.lax.associative_scan(comp, flipped, axis=0)
    suffix = {k: jnp.flip(v, 0) for k, v in suffix.items()}
    # Carry-OUT at the base of each layer = inclusive suffix applied to the
    # top carry; carry-IN = the layer above's carry-out (top layer: init).
    dn_dir_out = matvec(suffix["A"], dn_dir0)
    dn_diff_out = matvec(suffix["B"], dn_dir0) + matvec(suffix["C"], dn_diff0)
    dn_dir_in = jnp.concatenate(
        [dn_dir_out[1:],
         jnp.broadcast_to(dn_dir0, dn_dir_out.shape[1:])[None]], axis=0
    )
    dn_diff_in = jnp.concatenate(
        [dn_diff_out[1:],
         jnp.broadcast_to(dn_diff0, dn_diff_out.shape[1:])[None]], axis=0
    )
    return (dn_dir_in, dn_diff_in), (dn_dir_out[0], dn_diff_out[0])


def scalar_suffix_carries(c, init):
    """Carry-ins of a scalar multiplicative top-down recurrence.

    c: [L, C] per-layer factors (bottom layer first), init: [C].  Returns
    (carry_in [L, C], final [C]) matching a reverse lax.scan whose carry is
    multiplied by c each step.
    """
    cp = jnp.flip(jnp.cumprod(jnp.flip(c, 0), axis=0), 0)  # inclusive suffix
    out = cp * init[None]
    carry_in = jnp.concatenate(
        [out[1:], jnp.broadcast_to(init, out.shape[1:])[None]], axis=0
    )
    return carry_in, out[0]


# ----------------------------------------------------------------------
# Element construction
# ----------------------------------------------------------------------

def _wrap_operators(R, T, u_ov, v_ov, a_roof, nreg, ns):
    """Fold the top-interface overlap + roof block into the layer's
    two-sided operators: Rd = (u (x) I)[blockdiag(R, a_roof)](v (x) I),
    Td = T (v_reg (x) I), Tu = (u_reg (x) I) T, Ru = R."""
    Lx, Cx, Sx = R.shape[:3]
    nd = nreg * ns
    u_reg = u_ov[..., :, :nreg]       # [L,C,q(above),r(below)]
    u_roof = u_ov[..., :, nreg]       # [L,C,q]
    v_reg = v_ov[..., :nreg, :]       # [L,C,r(below),q(above)]
    v_roof = v_ov[..., nreg, :]       # [L,C,q]
    R6 = R.reshape(Lx, Cx, Sx, nreg, ns, nreg, ns)
    T_rows = T.reshape(Lx, Cx, Sx, nreg, ns, nd)
    T_cols = T.reshape(Lx, Cx, Sx, nd, nreg, ns)
    Td = jnp.einsum("lcsirn,lcrq->lcsiqn", T_cols, v_reg,
                    precision=_HI).reshape(Lx, Cx, Sx, nd, nd)
    Tu = jnp.einsum("lcqr,lcsrnj->lcsqnj", u_reg, T_rows,
                    precision=_HI).reshape(Lx, Cx, Sx, nd, nd)
    Rd = (
        jnp.einsum("lcqr,lcsrnpm,lcpw->lcsqnwm", u_reg, R6, v_reg,
                   precision=_HI)
        + jnp.einsum("lcq,lcsnm,lcw->lcsqnwm", u_roof, a_roof, v_roof,
                     precision=_HI)
    ).reshape(Lx, Cx, Sx, nd, nd)
    return Rd, Td, R, Tu


def sw_layer_star_elements(R, T, E, Sup, Sdn, u_ov, v_ov, a_roof, d_roof,
                           nreg, ns):
    """SW star elements: direct channel width p = nreg in the ABOVE basis.

    The direct beam crosses the interface first (v_ov redistributes it, the
    roof row reflecting d_roof), then the layer (E transmits, Sup/Sdn
    scatter into diffuse) — matching solver.up_step's
    d' = (u (x) I)[Sup + T(I-aR)^-1(dE + a Sdn) | d_roof] v_ov exactly.
    a_roof: [L,C,S,ns,ns]; d_roof: [L,C,S,ns].
    """
    Lx, Cx, Sx = R.shape[:3]
    nd = nreg * ns
    Rd, Td, Ru, Tu = _wrap_operators(R, T, u_ov, v_ov, a_roof, nreg, ns)
    u_reg = u_ov[..., :, :nreg]
    u_roof = u_ov[..., :, nreg]
    v_reg = v_ov[..., :nreg, :]
    v_roof = v_ov[..., nreg, :]
    Sup6 = Sup.reshape(Lx, Cx, Sx, nreg, ns, nreg)
    Su = (
        jnp.einsum("lcqr,lcsrnp,lcpw->lcsqnw", u_reg, Sup6, v_reg,
                   precision=_HI)
        + jnp.einsum("lcq,lcsn,lcw->lcsqnw", u_roof, d_roof, v_roof,
                     precision=_HI)
    ).reshape(Lx, Cx, Sx, nd, nreg)
    Sd = jnp.einsum("lcsip,lcpw->lcsiw", Sdn, v_reg, precision=_HI)
    E_el = jnp.einsum("lcspr,lcrw->lcspw", E, v_reg, precision=_HI)
    return {"Rd": Rd, "Td": Td, "Ru": Ru, "Tu": Tu, "E": E_el,
            "Su": Su, "Sd": Sd}


def lw_layer_star_elements(R, T, p_src, u_ov, v_ov, a_roof, source_roof,
                           nreg, ns):
    """LW star elements: source channel width 1 (emission column), E = 1.

    p_src [L,C,S,nd] is the layer's symmetric emission (up at its top, down
    at its base); source_roof [L,C,S,ns] the exposed-roof emission row —
    matching solver's LW up_step (radsurf_urban_lw.F90:567-614).
    """
    Lx, Cx, Sx = R.shape[:3]
    nd = nreg * ns
    Rd, Td, Ru, Tu = _wrap_operators(R, T, u_ov, v_ov, a_roof, nreg, ns)
    u_reg = u_ov[..., :, :nreg]
    u_roof = u_ov[..., :, nreg]
    p6 = p_src.reshape(Lx, Cx, Sx, nreg, ns)
    Su = (
        jnp.einsum("lcqr,lcsrn->lcsqn", u_reg, p6, precision=_HI)
        + jnp.einsum("lcq,lcsn->lcsqn", u_roof, source_roof, precision=_HI)
    ).reshape(Lx, Cx, Sx, nd, 1)
    Sd = p_src[..., None]
    E_el = jnp.ones((Lx, Cx, Sx, 1, 1), R.dtype)
    return {"Rd": Rd, "Td": Td, "Ru": Ru, "Tu": Tu, "E": E_el,
            "Su": Su, "Sd": Sd}
