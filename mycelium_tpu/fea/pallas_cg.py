"""Whole-solve Pallas kernel: one launch per PCG solve.

Motivation (measured on the axon-tunneled TPU v5e): an XLA while_loop CG
pays fixed per-op overhead every iteration (~60-100 us/iter for the ~15
small kernels of a CG body at 22k DOF), so an 870-iteration solve costs
~90 ms even though the arithmetic takes microseconds. This kernel runs the
ENTIRE preconditioned CG loop inside a single Mosaic program with all
operands resident in VMEM, and keeps the per-iteration op count minimal.

Layout: the chain-permuted displacement field lives in ONE stacked array
(3·NB, 128) — component plane k occupies rows [k·NB, (k+1)·NB), node
r·128+c of plane k at row k·NB+r lane c. NB is chosen so at least one
trailing node per plane is padding, which makes every cross-row carry land
on zero-stiffness slots. In this layout the whole operator requires NO
gathers and very few ops:

- chain edges (consecutive nodes after the chain permutation): ONE lane
  roll + ONE row roll for all three components at once;
- n·d contraction: elementwise + a 3-fold tile;
- the 3x3 block-Jacobi preconditioner: 3 plane-rolls and 3 multiplies
  (coefficient planes pre-shuffled so plane-roll j aligns component
  (i+j)%3 with row-plane i);
- jump edges: one-hot matmuls on the MXU, all three components fused into
  (J, NB)x(NB, 384) selections, chunked over J to bound VMEM. With
  Precision.HIGHEST (bf16x3 passes) the selections are f32-exact, keeping
  the operator symmetric.

The reference analogue is the PETSc KSPSolve call (src/fea_petsc.cpp:341);
this kernel is its TPU-native replacement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeaConfig
from .chain import BLOCK, ChainPlan
from .solve import SolveResult

JUMP_CHUNK = 1024

# entry budget of the MXU coarse jump assembly's dense (3J·n_basis, nc)
# incidence (f32: 2^28 entries = ~1 GB transient); bigger jump sets fall
# back to the 36-entries-per-jump scatter assembly (see
# _coarse_matrix_chain — the xlarge coupled mesh's 488k jumps built a
# 7.9 GB X inside the ramp's factor recompute and OOM'd the HBM)
COARSE_MXU_CAP = 1 << 28


class PackedChainData(NamedTuple):
    """Static stacked-plane tables (built once per mesh).

    Jump endpoints a and b are stacked into single tables so each chunk
    needs ONE gather and ONE scatter matmul per component: rows are laid
    out per chunk of C jump pairs as [a-rows (C), b-rows (C)], so row-slice
    [ci·2C, ci·2C+2C) covers both endpoints of pair chunk ci.
    """
    cn: jnp.ndarray       # (3*NB, 128) chain direction component planes
    ckax: jnp.ndarray     # (3*NB, 128) chain EA/L, tiled over planes
    ckbd: jnp.ndarray     # (3*NB, 128)
    ab_blk: jnp.ndarray   # (2*Jp, NB) one-hot over node blocks
    ab_lane: jnp.ndarray  # (2*Jp, 128) one-hot over lanes within the block
    jscal: jnp.ndarray    # (Jp, 128): lanes 0..4 = [n_x, n_y, n_z, kax, kbd]

    @property
    def nb(self) -> int:
        return self.cn.shape[0] // 3


def plan_nb(n_nodes: int) -> int:
    """Blocks per plane, always leaving >= 1 padding node per plane so
    cross-row/cross-plane roll carries only touch zero-stiffness slots."""
    return n_nodes // BLOCK + 1


def _pack_plane(v, nb):
    """(N,) -> (NB, 128)."""
    pad = nb * BLOCK - v.shape[0]
    return jnp.pad(v, (0, pad)).reshape(nb, BLOCK)


def pack_vec3(v, nb):
    """(N, 3) -> (3*NB, 128) stacked component planes."""
    return jnp.concatenate([_pack_plane(v[:, k], nb) for k in range(3)],
                           axis=0)


def unpack_vec3(p, n, nb):
    return jnp.stack([p[k * nb:(k + 1) * nb].reshape(-1)[:n]
                      for k in range(3)], axis=1)


def _tile3(p):
    return jnp.concatenate([p, p, p], axis=0)


def chain_table_bytes(plan: "ChainPlan", n_nodes: int) -> int:
    """Byte count of the PackedChainData VMEM tables (ab_blk grows as
    n_jumps x n_nodes/128 — quadratic-ish on jump-heavy meshes)."""
    if plan.a_blk is None:      # huge mesh: one-hots not even built
        return 1 << 62
    nb = plan_nb(n_nodes)
    jp = plan.a_blk.shape[0]
    jpad = max((jp + JUMP_CHUNK - 1) // JUMP_CHUNK, 1) * JUMP_CHUNK
    return (2 * 2 * jpad * (nb + BLOCK)    # ab_blk + ab_lane (bf16)
            + 4 * jpad * BLOCK             # jscal
            + 4 * 4 * 3 * nb * BLOCK)      # cn/ckax/ckbd + working planes


def pack_plan(plan: ChainPlan, n_nodes: int,
              host: dict | None = None,
              nb: int | None = None) -> PackedChainData:
    """Build the kernel's VMEM tables. Pass ``host`` (the dict filled by
    build_chain_plan's host_out) so nothing is fetched back from the
    device: 2-D device->host fetches cost ~60-90s per shape on the axon
    tunnel. Without it, the plan's device arrays are fetched (slow path,
    kept for standalone/test use).

    ``nb`` overrides the plane block count (>= plan_nb(n_nodes)) — the
    unified tree/chain kernel needs the chain planes at least as tall as
    the tree slot planes so slot space is a row-slice of chain space."""
    if nb is None:
        nb = plan_nb(n_nodes)
    assert nb >= plan_nb(n_nodes)
    f32 = jnp.float32

    def hget(name):
        return (host[name] if host is not None
                else np.asarray(getattr(plan, name)))

    h_a_blk = hget("a_blk")
    jp = h_a_blk.shape[0]
    jpad = max((jp + JUMP_CHUNK - 1) // JUMP_CHUNK, 1) * JUMP_CHUNK - jp

    def padj(x):
        # pure numpy: a jnp round-trip here costs a device transfer + fetch
        return np.pad(np.asarray(x, np.float32), ((0, jpad), (0, 0)))

    jscal = np.zeros((jp, BLOCK), np.float32)
    jscal[:, 0:3] = np.asarray(hget("jump_n"), np.float32)
    jscal[:, 3] = np.asarray(hget("jump_kax"), np.float32)
    jscal[:, 4] = np.asarray(hget("jump_kbd"), np.float32)
    # a_blk columns sized to this nb (ChainPlan's NB may be one smaller)
    a_blk = np.asarray(h_a_blk, np.float32)
    b_blk = np.asarray(hget("b_blk"), np.float32)
    if a_blk.shape[1] < nb:
        extra = nb - a_blk.shape[1]
        a_blk = np.pad(a_blk, ((0, 0), (0, extra)))
        b_blk = np.pad(b_blk, ((0, 0), (0, extra)))
    a_blk = padj(a_blk)
    b_blk = padj(b_blk)
    a_lane = padj(hget("a_lane"))
    b_lane = padj(hget("b_lane"))
    jtot = a_blk.shape[0]
    # interleave a/b at chunk granularity: [a-chunk0; b-chunk0; a-chunk1; ..]
    nch = jtot // JUMP_CHUNK

    def inter(a, b):
        parts = []
        for c in range(nch):
            parts.append(a[c * JUMP_CHUNK:(c + 1) * JUMP_CHUNK])
            parts.append(b[c * JUMP_CHUNK:(c + 1) * JUMP_CHUNK])
        return np.concatenate(parts, axis=0)

    # jump one-hots in bf16 (0/1 exact; kernels upcast per chunk before
    # the HIGHEST-precision matmuls) — halves their VMEM footprint
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16

    def plane_np(v):                       # (N,) -> (nb, 128) numpy
        v = np.asarray(v, np.float32)
        return np.pad(v, (0, nb * BLOCK - v.shape[0])).reshape(nb, BLOCK)

    cn_np = np.concatenate([plane_np(np.asarray(hget("chain_n"))[:, k])
                            for k in range(3)], axis=0)
    ckax_np = np.tile(plane_np(hget("chain_kax")), (3, 1))
    ckbd_np = np.tile(plane_np(hget("chain_kbd")), (3, 1))
    return PackedChainData(
        cn=jnp.asarray(cn_np),
        ckax=jnp.asarray(ckax_np),
        ckbd=jnp.asarray(ckbd_np),
        ab_blk=jnp.asarray(inter(a_blk, b_blk).astype(bf16)),
        ab_lane=jnp.asarray(inter(a_lane, b_lane).astype(bf16)),
        jscal=jnp.asarray(padj(jscal)),
    )


def _cg_kernel(nb, jp, max_iter, rtol, reg, use_ramp,
               uk_ref, x0_ref, freem_ref, cact_ref, jact_ref,
               cn_ref, ckax_ref, ckbd_ref,
               ab_blk_ref, ab_lane_ref, jscal_ref,
               c3_ref, ainv_ref,
               x_out_ref, stats_ref):
    f32 = jnp.float32
    s_rows = 3 * nb
    lane = lax.broadcasted_iota(jnp.int32, (s_rows, BLOCK), 1)
    last_lane = lane == BLOCK - 1
    first_lane = lane == 0
    hi = lax.Precision.HIGHEST
    n_chunks = jp // JUMP_CHUNK

    freem = freem_ref[:]
    pinm = 1.0 - freem
    cact = cact_ref[:]                 # (3*NB, 128), tiled over planes
    cn = cn_ref[:] * cact
    ckax = ckax_ref[:] * cact
    ckbd = ckbd_ref[:] * cact
    uk = uk_ref[:]
    c3 = (c3_ref[0 * s_rows:1 * s_rows],
          c3_ref[1 * s_rows:2 * s_rows],
          c3_ref[2 * s_rows:3 * s_rows])

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def shift_up(x):
        """y[node i] = x[node i+1], all planes at once; cross-row (and
        cross-plane) carries land on padding slots with zero stiffness."""
        a = roll(x, -1, 1)
        b = roll(a, -1, 0)
        return jnp.where(last_lane, b, a)

    def shift_down(x):
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        return jnp.where(first_lane, b, a)

    def plane_sum(s):
        """sum the three planes -> (NB, 128)."""
        return (s[0 * nb:1 * nb] + s[1 * nb:2 * nb] + s[2 * nb:3 * nb])

    def matvec_raw(u):
        # ---- chain part ----
        d = u - shift_up(u)
        nd = _tile3(plane_sum(cn * d))
        f = ckax * nd * cn + ckbd * (d - nd * cn)
        out = f - shift_down(f)

        # ---- jump part: chunked one-hot MXU selections; both endpoints of
        # a chunk ride in the same matmul (rows [a-chunk; b-chunk]) ----
        u_planes = (u[0 * nb:1 * nb], u[1 * nb:2 * nb], u[2 * nb:3 * nb])

        def chunk_body(ci, out):
            sl2 = pl.ds(ci * 2 * JUMP_CHUNK, 2 * JUMP_CHUNK)
            slp = pl.ds(ci * JUMP_CHUNK, JUMP_CHUNK)
            ab_blk = ab_blk_ref[sl2, :].astype(f32)        # (2C, NB)
            ab_lane = ab_lane_ref[sl2, :].astype(f32)
            jscal = jscal_ref[slp, :]
            jact1 = jact_ref[slp, :][:, 0:1]
            jn = (jscal[:, 0:1], jscal[:, 1:2], jscal[:, 2:3])
            jkax = jscal[:, 3:4] * jact1
            jkbd = jscal[:, 4:5] * jact1

            dj = []
            for k in range(3):
                t = jnp.dot(ab_blk, u_planes[k], precision=hi,
                            preferred_element_type=f32)    # (2C, 128)
                s = jnp.sum(t * ab_lane, axis=1, keepdims=True)
                dj.append(s[:JUMP_CHUNK] - s[JUMP_CHUNK:])  # (C, 1)
            ndj = jn[0] * dj[0] + jn[1] * dj[1] + jn[2] * dj[2]
            contract0 = (((0,), (0,)), ((), ()))
            diffs = []
            for k in range(3):
                fj = jkax * ndj * jn[k] + jkbd * (dj[k] - ndj * jn[k])
                fj2 = jnp.concatenate([fj, -fj], axis=0)   # (2C, 1)
                diffs.append(
                    lax.dot_general(ab_blk, ab_lane * fj2, contract0,
                                    precision=hi,
                                    preferred_element_type=f32))
            return out + jnp.concatenate(diffs, axis=0)

        return lax.fori_loop(0, n_chunks, chunk_body, out)

    def matvec(u):
        uf = freem * u
        return freem * (matvec_raw(uf) + reg * uf) + pinm * u

    rampl = (lane.astype(f32) - (BLOCK - 1) / 2) / (BLOCK / 2)

    def precond(r):
        # block-Jacobi: z[plane i] = sum_j C_j[plane i] * r[plane (i+j)%3]
        z = (c3[0] * r + c3[1] * roll(r, -nb, 0)
             + c3[2] * roll(r, -2 * nb, 0))
        # additive coarse-grid correction (two-level Schwarz): clusters are
        # the 128-node rows, with a piecewise-linear basis per cluster
        # (constant + in-chain ramp) — restriction is two lane reductions,
        # prolongation two lane broadcasts
        rc0 = jnp.sum(r, axis=1, keepdims=True)           # (3NB, 1)
        if use_ramp:
            rc1 = jnp.sum(r * rampl, axis=1, keepdims=True)
            rc = jnp.concatenate([rc0, rc1], axis=0)      # (6NB, 1)
        else:
            rc = rc0
        # default precision: the preconditioner only needs to be a fixed
        # linear SPD-ish operator, not exact — bf16 passes are 3x cheaper
        zc = jnp.dot(ainv_ref[:], rc,
                     preferred_element_type=f32)
        if use_ramp:
            return z + freem * (zc[:s_rows] + rampl * zc[s_rows:])
        return z + freem * zc

    def dot(a, b):
        return jnp.sum(a * b)

    kuk = matvec_raw(uk)
    b = pinm * uk - freem * kuk
    bnorm2 = dot(freem * b, freem * b)
    tol2 = rtol * rtol * bnorm2

    x0 = freem * x0_ref[:] + pinm * uk
    r0 = b - matvec(x0)
    z0 = precond(r0)
    rz0 = dot(r0, z0)
    rr0 = dot(r0, r0)

    def cond(s):
        return jnp.logical_and(s[5] < max_iter, s[4] > tol2)

    def body(s):
        x, r, z, p, rr, k, rz = s
        ap = matvec(p)
        pap = dot(p, ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, z, p, dot(r, r), k + 1, rz_new)

    x, r, z, p, rr, k, rz = lax.while_loop(
        cond, body,
        (x0, r0, z0, z0, rr0, jnp.asarray(0, jnp.int32), rz0))

    x_out_ref[:] = x
    sl = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats = jnp.where(sl == 0, k.astype(f32),
                      jnp.where(sl == 1, jnp.sqrt(rr),
                                jnp.where(sl == 2, jnp.sqrt(tol2), 0.0)))
    stats_ref[:] = stats


def _ramp_weight(pos_in_cluster, width: int = BLOCK):
    """Normalized linear coordinate within a width-node cluster, in
    [-1, 1]."""
    return (pos_in_cluster.astype(jnp.float32) - (width - 1) / 2) \
        / (width / 2)


def coarse_cluster_blocks(nb: int, cfg) -> int:
    """128-position chain blocks per coarse cluster: the smallest k that
    keeps the dense coarse operator's dimension n_basis*3*ceil(nb/k) under
    cfg.coarse_max_dim (k=1 — one block per cluster — up to ~131k nodes
    with the 'const' basis and the 3072 default). Every consumer of
    _coarse_inverse must restrict/prolong with the SAME k."""
    n_basis = 2 if cfg.coarse_basis == "linear" else 1
    cap = max(int(cfg.coarse_max_dim), 3 * n_basis)
    return -(-(3 * n_basis * nb) // cap)


def _coarse_matrix_scatter(model, plan, active, free, cfg, nb,
                           kblk: int = 1):
    """Element-scatter assembly of the coarse Galerkin matrix (the
    original formulation; kept as the oracle for _coarse_matrix_chain —
    its (E·(6b)²) scatter-add costs ~45 ms at 103k nodes)."""
    from .elements import element_stiffness_batch
    f32 = jnp.float32
    conn = model.conn
    width = kblk * BLOCK                             # cluster width
    nbc = -(-nb // kblk)                             # clusters
    nc3 = 3 * nbc
    nc = (2 if cfg.coarse_basis == "linear" else 1) * nc3
    n_basis = 2 if cfg.coarse_basis == "linear" else 1
    pos = plan.inv_perm                              # (N,) chain position
    cl = pos // width                                # (N,) cluster ids
    ramp = _ramp_weight(pos % width, width)          # (N,)
    ke = element_stiffness_batch(model.geom).astype(f32)      # (E,6,6)
    f = free.astype(f32)
    # expand the 6x6 element block to the coarse dofs: order
    # (endpoint, basis) groups x 3 comps = [p0c(, p0r), p1c(, p1r)] x xyz
    rowmap = jnp.asarray(
        ([0, 1, 2] * n_basis) + ([3, 4, 5] * n_basis), jnp.int32)
    ke12 = ke[:, rowmap][:, :, rowmap]               # (E,6b,6b)
    w = []
    dof = []
    comp = jnp.arange(3, dtype=jnp.int32)
    for p in range(2):
        n_p = conn[:, p]
        for fb in range(n_basis):                    # basis: const(, ramp)
            wgt = (f[n_p] if fb == 0 else f[n_p] * ramp[n_p])
            w.append(jnp.repeat(wgt[:, None], 3, axis=1))
            dof.append(fb * nc3 + comp[None, :] * nbc + cl[n_p][:, None])
    nd = 6 * n_basis
    w12 = jnp.concatenate(w, axis=1)                 # (E,6b)
    dof12 = jnp.concatenate(dof, axis=1)             # (E,6b)
    vals = ke12 * (w12[:, :, None] * w12[:, None, :]) \
        * active.astype(f32)[:, None, None]
    rows = jnp.repeat(dof12, nd, axis=1)
    cols = jnp.tile(dof12, (1, nd))
    flat = (rows * nc + cols).reshape(-1)
    a = jnp.zeros((nc * nc,), f32).at[flat].add(vals.reshape(-1))
    # reg·P per node: 2x2 basis block [1, r; r, r^2] per comp. NO (I-P)
    # identity term: the restriction is free-masked (pinned residual rows
    # are zero) and grip identity entries would flatten the correction.
    dreg = np.float32(cfg.reg) * f
    base = comp[None, :] * nbc + cl[:, None]         # (N,3)
    for fa in range(n_basis):
        for fb in range(n_basis):
            wv = dreg * (ramp ** (fa + fb))
            ia = fa * nc3 + base
            ib = fb * nc3 + base
            a = a.at[(ia * nc + ib).reshape(-1)].add(
                jnp.repeat(wv[:, None], 3, 1).reshape(-1))
    return a.reshape(nc, nc)


def _coarse_matrix_chain(model, plan, active, free, cfg, nb,
                         kblk: int = 1):
    """Chain-banded assembly of the coarse Galerkin matrix.

    Clusters are CONTIGUOUS runs of chain positions, so a chain edge
    (position i -- i+1) couples cluster cl(i) to itself or to cl(i)+1:
    per (basis a, basis b, comp, comp') pair the whole chain's
    contribution reduces to cluster reshape-sums plus one strided slice
    for the boundary slots — banded writes of O(nbc) instead of the
    element scatter's E·(6b)² updates (14.8M at 103k nodes, ~45 ms; this
    form is ~1 ms). Jump edges (few thousand) keep a small scatter.
    Numerically the same matrix up to summation order
    (tests/test_pallas_solver.py compares against
    _coarse_matrix_scatter)."""
    f32 = jnp.float32
    width = kblk * BLOCK
    nbc = -(-nb // kblk)
    nc3 = 3 * nbc
    n_basis = 2 if cfg.coarse_basis == "linear" else 1
    nc = n_basis * nc3
    n = model.n_nodes
    npad = nbc * width
    car = jnp.arange(nbc, dtype=jnp.int32)

    def padp(x):
        return jnp.pad(x.astype(f32), (0, npad - n))

    act_pad = jnp.concatenate([active.astype(bool),
                               jnp.zeros((1,), bool)])
    f_pos = padp(free[plan.perm].astype(f32))
    ramp_pos = _ramp_weight(jnp.arange(npad, dtype=jnp.int32) % width,
                            width)
    # endpoint weights per basis: a = position i, b = position i+1
    wa = [f_pos] + ([f_pos * ramp_pos] if n_basis == 2 else [])
    wb = [jnp.concatenate([w[1:], jnp.zeros((1,), f32)]) for w in wa]

    # chain-edge k3 component planes (full operator: no tree mask)
    m_c = padp(act_pad[plan.chain_elem].astype(f32))
    ncmp = [padp(plan.chain_n[:, k]) for k in range(3)]
    kd = padp(plan.chain_kax - plan.chain_kbd) * m_c
    kb = padp(plan.chain_kbd) * m_c

    inb = ((jnp.arange(npad, dtype=jnp.int32) % width) != width - 1
           ).astype(f32)
    bslice = slice(width - 1, None, width)
    # ONE flat scatter-add for every contribution class: the per-combo
    # .at[] writes (27 banded + 36-144 jump + reg) serialized into ~70-250
    # separate scatter ops at ~2.5 us dispatch each on the tunneled TPU —
    # part of the 309k solve's non-CG XLA tail (VERDICT r3 #2)
    idx_parts, val_parts = [], []
    # rows * nc + cols is formed in int32: past nc = 46340 the product
    # overflows. Unreachable for the coarse_max_dim-capped sizes
    # (~768-3072), but nothing else guards a future widening.
    assert nc <= 46340, f"coarse dim {nc} overflows int32 flat indices"

    def emit(rows, cols, vals):
        idx_parts.append((rows * nc + cols).reshape(-1))
        val_parts.append(vals.reshape(-1))

    for kc in range(3):
        for kc2 in range(3):
            k3p = ncmp[kc] * ncmp[kc2] * kd
            if kc == kc2:
                k3p = k3p + kb
            for fa in range(n_basis):
                for fb in range(n_basis):
                    v00 = wa[fa] * wa[fb] * k3p
                    v11 = wb[fa] * wb[fb] * k3p
                    v01 = -wa[fa] * wb[fb] * k3p
                    v10 = -wb[fa] * wa[fb] * k3p
                    d = v00.reshape(nbc, width).sum(1)
                    # p1p1 belongs to cluster of position i+1
                    d = d + jnp.concatenate(
                        [jnp.zeros((1,), f32), v11[:-1]]
                    ).reshape(nbc, width).sum(1)
                    d = d + ((v01 + v10) * inb).reshape(nbc,
                                                        width).sum(1)
                    rows = fa * nc3 + kc * nbc + car
                    cols = fb * nc3 + kc2 * nbc + car
                    emit(rows, cols, d)
                    emit(rows[:-1], cols[1:], v01[bslice][:-1])
                    emit(rows[1:], cols[:-1], v10[bslice][:-1])

    # jump edges, assembled on the MXU when the incidence fits: the old
    # form scattered 36·n_basis² entries per jump — 0.5M scatter rows at
    # 340k nodes (~6.5 ms of the 8.5 ms coarse build; round-5 phase
    # profile). The jump stiffness block is the PSD sum
    # kax·n nᵀ + kbd·(t1 t1ᵀ + t2 t2ᵀ) (orthonormal frame from the STATIC
    # jump direction — the naive (kax−kbd) split is indefinite because
    # kbd > kax at the reference's element slenderness), so the whole
    # jump contribution is A_jump = Xᵀ X with one coarse incidence row
    # per (jump, direction): X[j,d] has ±√coeff·w·d_kc at the two
    # endpoint clusters. One (nc, 3J)·(3J, nc) MXU product replaces the
    # scatter; Precision.HIGH keeps ~1e-6 relative accuracy (this matrix
    # is inverted for a PC, and the banded chain part stays exact).
    # GATE: X is dense (3J·n_basis, nc) — real exported meshes are
    # anastomosis-heavy (the xlarge coupled mesh has 488k jumps, 16% of
    # edges, where the synthetic bench meshes have 4%) and X reached
    # 7.9 GB inside the ramp's factor recompute — HBM OOM at 2.97M DOF.
    # Past the entry budget the original scatter assembly runs instead.
    jp = plan.ja.shape[0]
    a_jump = None
    use_mxu_jumps = jp and (3 * jp * n_basis * nc) <= COARSE_MXU_CAP
    if jp:
        m_j = act_pad[plan.jump_elem].astype(f32)
        ja = jnp.minimum(plan.ja, npad - 1)
        jb = jnp.minimum(plan.jb, npad - 1)
        jok = (plan.ja < n) & (plan.jb < n)
        m_j = m_j * jok.astype(f32)
        cl_a = (ja // width).astype(jnp.int32)
        cl_b = (jb // width).astype(jnp.int32)
        wja = [f_pos[ja]] + ([f_pos[ja] * ramp_pos[ja]]
                             if n_basis == 2 else [])
        wjb = [f_pos[jb]] + ([f_pos[jb] * ramp_pos[jb]]
                             if n_basis == 2 else [])
    if use_mxu_jumps:
        nvec = plan.jump_n.astype(f32)                       # (J,3) unit
        ref = jnp.where(jnp.abs(nvec[:, 2:3]) < 0.9,
                        jnp.asarray([0.0, 0.0, 1.0], f32)[None],
                        jnp.asarray([1.0, 0.0, 0.0], f32)[None])
        t1 = jnp.cross(nvec, ref)
        t1 = t1 / jnp.maximum(
            jnp.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
        t2 = jnp.cross(nvec, t1)
        ar = jnp.arange(nbc, dtype=jnp.int32)
        Ca = (cl_a[:, None] == ar[None, :]).astype(f32)      # (J, nbc)
        Cb = (cl_b[:, None] == ar[None, :]).astype(f32)
        x_parts = []
        for d, c in ((nvec, plan.jump_kax * m_j),
                     (t1, plan.jump_kbd * m_j),
                     (t2, plan.jump_kbd * m_j)):
            s = jnp.sqrt(jnp.maximum(c, 0.0))
            blocks = []
            for fa in range(n_basis):
                diff = ((s * wja[fa])[:, None] * Ca
                        - (s * wjb[fa])[:, None] * Cb)       # (J, nbc)
                for kc in range(3):
                    blocks.append(d[:, kc:kc + 1] * diff)
            x_parts.append(jnp.concatenate(blocks, axis=1))  # (J, nc)
        x_inc = jnp.concatenate(x_parts, axis=0)             # (3J, nc)
        a_jump = jnp.dot(x_inc.T, x_inc, precision=lax.Precision.HIGH)
    elif jp:
        jn = [plan.jump_n[:, k] for k in range(3)]
        jkd = (plan.jump_kax - plan.jump_kbd) * m_j
        jkb = plan.jump_kbd * m_j
        for kc in range(3):
            for kc2 in range(3):
                k3j = jn[kc] * jn[kc2] * jkd
                if kc == kc2:
                    k3j = k3j + jkb
                for fa in range(n_basis):
                    for fb in range(n_basis):
                        ra = fa * nc3 + kc * nbc
                        rb = fb * nc3 + kc2 * nbc
                        emit(ra + cl_a, rb + cl_a,
                             wja[fa] * wja[fb] * k3j)
                        emit(ra + cl_b, rb + cl_b,
                             wjb[fa] * wjb[fb] * k3j)
                        emit(ra + cl_a, rb + cl_b,
                             -wja[fa] * wjb[fb] * k3j)
                        emit(ra + cl_b, rb + cl_a,
                             -wjb[fa] * wja[fb] * k3j)

    # reg·P per position: 2x2 basis block [1, r; r, r^2] per comp. NO
    # (I-P) identity term (see _coarse_matrix_scatter).
    dreg = np.float32(cfg.reg) * f_pos
    for fa in range(n_basis):
        for fb in range(n_basis):
            wv = (dreg * (ramp_pos ** (fa + fb))).reshape(
                nbc, width).sum(1)
            for kc in range(3):
                emit(fa * nc3 + kc * nbc + car,
                     fb * nc3 + kc * nbc + car, wv)

    flat = jnp.zeros((nc * nc,), f32).at[
        jnp.concatenate(idx_parts)].add(
        jnp.concatenate([v.astype(f32) for v in val_parts]))
    a = flat.reshape(nc, nc)
    return a + a_jump if a_jump is not None else a


def _coarse_inverse(model, plan, active, free, cfg, nb, kblk: int = 1):
    """Galerkin coarse operator for the two-level preconditioner.

    Clusters = ``kblk`` consecutive 128-position chain blocks (``kblk``
    rows of the plane layout; coarse_cluster_blocks picks the smallest
    kblk that keeps the dense dimension under cfg.coarse_max_dim — an
    uncapped inverse crashes the TPU worker past ~4.7k dim and would be
    23k-dim at 1e6 nodes). The coarse space is piecewise LINEAR along the
    chain per cluster per component — a constant and an in-chain ramp
    function — which captures the dominant stretching modes of long hyphae
    far better than constants alone. Coarse DOF index = f*3*NBC + k*NBC +
    cluster with f in {const, ramp}, NBC = ceil(nb/kblk); assembled from
    the free-masked operator P·K·P + reg·P, symmetrically normalized, and
    densely inverted (3·NBC is ~400 at 1e5 DOF — trivial).

    Clusters are ALWAYS defined by chain position (plan.inv_perm): every
    caller — node-space, chain-space and sharded — restricts per-cluster
    in chain order with the same kblk, and a different position array here
    would desynchronize the coarse operator from their cluster
    restriction."""
    f32 = jnp.float32
    a = _coarse_matrix_chain(model, plan, active, free, cfg, nb, kblk)
    nc = a.shape[0]
    d = jnp.diagonal(a)
    s = jnp.where(d > 0, jax.lax.rsqrt(jnp.maximum(d, 1e-30)), 1.0)
    an = s[:, None] * a * s[None, :] \
        + np.float32(1e-5) * jnp.eye(nc, dtype=f32) \
        + jnp.diag(jnp.where(d > 0, 0.0, 1.0).astype(f32))
    ainv_n = jnp.linalg.inv(an)
    return s[:, None] * ainv_n * s[None, :]


def pallas_chain_solve(model, packed: PackedChainData, active,
                       dy_top, dy_bot, x0, cfg: FeaConfig, anchored=None):
    """Run one boundary-value solve in a single Pallas kernel (f32)."""
    from .bc import prescribed_values
    from .chain import plan_active_masks
    from .model import diag_blocks, invert_blocks

    plan = model.chain
    n = model.n_nodes
    nb = packed.nb
    jp = packed.jscal.shape[0]
    f32 = jnp.float32

    free = model.free_nodes if anchored is None \
        else jnp.logical_and(model.free_nodes, anchored)
    chain_act, jump_act = plan_active_masks(plan, active)
    cact = _tile3(_pack_plane(chain_act.astype(f32), nb))
    jact_col = jnp.pad(jump_act.astype(f32), (0, jp - jump_act.shape[0]))
    jact = jnp.broadcast_to(jact_col[:, None], (jp, BLOCK))

    u_k = prescribed_values(model, dy_top, dy_bot).astype(f32)
    free3 = jnp.repeat(free[plan.perm].astype(f32)[:, None], 3, axis=1)
    freem = pack_vec3(free3, nb)
    uk_p = pack_vec3(u_k[plan.perm], nb)
    x0_p = pack_vec3(x0.astype(f32)[plan.perm], nb)

    inv_b = invert_blocks(diag_blocks(model, active, cfg,
                                      free)).astype(f32)[plan.perm]
    # C_j stacked so that plane-roll j aligns: C_j[plane i] = inv[:, i, (i+j)%3]
    c3 = jnp.concatenate(
        [pack_vec3(jnp.stack([inv_b[:, i, (i + j) % 3] for i in range(3)],
                             axis=1), nb)
         for j in range(3)], axis=0)

    ainv = _coarse_inverse(model, plan, active, free, cfg, nb)

    kernel = functools.partial(_cg_kernel, nb, jp, cfg.max_iter,
                               np.float32(cfg.rtol), np.float32(cfg.reg),
                               cfg.coarse_basis == "linear")
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    x_p, stats = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3 * nb, BLOCK), f32),
                   jax.ShapeDtypeStruct((1, 128), f32)),
        in_specs=[vmem() for _ in range(13)],
        out_specs=(vmem(), vmem()),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",   # CPU: test path
    )(uk_p, x0_p, freem, cact, jact,
      packed.cn, packed.ckax, packed.ckbd,
      packed.ab_blk, packed.ab_lane,
      packed.jscal, c3, ainv)

    x = unpack_vec3(x_p, n, nb)[plan.inv_perm]
    iters = stats[0, 0].astype(jnp.int32)
    rnorm = stats[0, 1]
    return SolveResult(x=x.astype(model.coords.dtype), iters=iters,
                       resnorm=rnorm, converged=rnorm <= stats[0, 2])
