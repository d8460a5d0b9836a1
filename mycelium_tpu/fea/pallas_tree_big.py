"""Split-kernel solve for large meshes (309k+ DOF): XLA CG loop driving a
Pallas matvec kernel and a Pallas tree-PC kernel.

Why not one whole-solve kernel here: Mosaic's register allocator gives
every spilled plane-sized SSA value its own VMEM slot, and a kernel that
contains factorization + matvec + preconditioner + CG accumulates ~350 of
them (~80-90 MB measured at 309k DOF) — VMEM busts regardless of how small
the static tables are. Splitting by function keeps each program's value
count (and therefore spill scratch) small:

  - FACTORIZATION once per solve in XLA (tree_jax.tree_factor_fast — the
    gather-free path), coefficients reshaped to plane layout
    (_factor_planes);
  - CG loop in XLA (solve.pcg on the packed plane vectors; ~10 vector ops
    + 2 kernel launches per iteration);
  - chain matvec as one kernel (shifts + jump one-hot matmuls);
  - forward/backward tree-PC apply as one kernel (PCR rounds + endpoint
    gathers/attachment scatters).

Uses the unified chain==slot ordering and a subset of the PackedTreeData
tables. Selected by build_model when the single-kernel estimate exceeds
VMEM but this one fits.

Reference analogue: PETSc KSPSolve+ICC at scale
(src/fea_petsc_parallel.cpp:336-351 is the reference's answer to big
meshes; this is ours on one chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeaConfig
from .chain import BLOCK
from .solve import SolveResult

HI = lax.Precision.HIGHEST


def hybrid_vmem_bytes(schedule, n_nodes: int) -> int:
    """VMEM estimate for the LARGER of the two split kernels (the PC
    apply): coefficient inputs + endpoint tables + a modest spill
    allowance (its body is vector 3-tuples, not 3x3 fields)."""
    from .pallas_cg import plan_nb
    from .pallas_tree import tree_slot_blocks
    levels = schedule.levels
    L = len(levels)
    P_tot = sum(len(lv.first_pos) for lv in levels)
    NBt = tree_slot_blocks(schedule)
    NPb = ((max(P_tot // BLOCK + 1, 1) + 7) // 8) * 8
    Sp, Pp = NBt * BLOCK, NPb * BLOCK
    nbc = max(plan_nb(n_nodes), NBt)
    r_star = 0
    for lv in levels:
        lens = lv.last_pos - lv.first_pos + 1
        maxlen = int(lens.max()) if len(lens) else 1
        r_star = max(r_star, int(np.ceil(np.log2(max(maxlen, 1)))))
    f32s = (
        2 * max(r_star, 1) * 9 * Sp     # ascr/bscr inputs
        + 9 * Sp + 2 * 9 * Pp           # dinv, ab0/ab1 inputs
        + L * Sp + L * Pp               # lvm, pvm
        + 2 * 3 * nbc * BLOCK           # r in, z out
        + 3 * nbc * BLOCK               # slotcov
        + 80 * Sp                       # spill allowance (vector tuples)
        + 2 * 1024 * (NBt + BLOCK)      # chunk upcast transients
    )
    bf16s = (
        2 * 2 * Pp * (NBt + BLOCK)      # fl, at
        + Pp * (NPb + BLOCK)            # idp
        + 2 * Pp * (2 * NPb + BLOCK)    # id2p
    )
    return 4 * f32s + 2 * bf16s


def _factor_planes(tplan, factor, nbt: int, npb: int, r_star: int):
    """Reshape tree_jax.TreeFactor into the kernels' packed plane layout.

    Returns (ascr, bscr) (r*9*NBt, 128), dinv9 (9*NBt, 128) and
    attB0/attB1 (9*NPb, 128). Rounds a level did not run are zero, which
    makes the global r_star-round pcr_update a no-op there."""
    meta = tplan.meta
    L = len(meta.level_steps)
    S_tot = tplan.n_slots
    P_tot = tplan.n_paths
    Sp, Pp = nbt * BLOCK, npb * BLOCK
    f32 = jnp.float32

    def pack_rounds(parts):
        padded = []
        for li in range(L):
            p = parts[li].astype(f32)
            pad_r = r_star - p.shape[0]
            if pad_r:
                p = jnp.concatenate(
                    [p, jnp.zeros((pad_r,) + p.shape[1:], f32)], axis=0)
            padded.append(p)
        allp = jnp.concatenate(padded, axis=1)          # (r, S_tot, 3, 3)
        allp = jnp.pad(allp, ((0, 0), (0, Sp - S_tot), (0, 0), (0, 0)))
        # row order: k-major, then (i, j), then slot plane rows
        return jnp.transpose(allp, (0, 2, 3, 1)).reshape(
            r_star * 9 * nbt, BLOCK)

    ascr = pack_rounds(factor.alphas)
    bscr = pack_rounds(factor.betas)

    dinv = jnp.pad(factor.dinv.astype(f32), ((0, Sp - S_tot), (0, 0),
                                             (0, 0)))
    dinv9 = jnp.transpose(dinv, (1, 2, 0)).reshape(9 * nbt, BLOCK)

    ab = jnp.pad(factor.att_b.astype(f32),
                 ((0, Pp - P_tot), (0, 0), (0, 0), (0, 0)))
    ab0 = jnp.transpose(ab[:, 0], (1, 2, 0)).reshape(9 * npb, BLOCK)
    ab1 = jnp.transpose(ab[:, 1], (1, 2, 0)).reshape(9 * npb, BLOCK)
    return ascr, bscr, dinv9, ab0, ab1


# ---------------------------------------------------------------------------
# matvec kernel: BC'd K·u on packed chain planes
# ---------------------------------------------------------------------------

def _matvec_kernel(nbc, jp, reg, bc,
                   u_ref, freem_ref, cnm_ref, ckaxm_ref, ckbdm_ref,
                   ab_blk_ref, ab_lane_ref, jscal_ref, jact_ref,
                   out_ref):
    """bc=True: the SPD BC'd operator freem*(K(freem u)+reg freem u)+pin u.
    bc=False: raw K·u on the full vector (the RHS needs -K_fk·u_k, i.e.
    pinned COLUMNS kept)."""
    f32 = jnp.float32
    from .pallas_cg import JUMP_CHUNK
    c_lane = lax.broadcasted_iota(jnp.int32, (3 * nbc, BLOCK), 1)
    last_lane = c_lane == BLOCK - 1
    first_lane = c_lane == 0
    n_chunks = jp // JUMP_CHUNK
    contract0 = (((0,), (0,)), ((), ()))

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def shift_up_c(x):
        a = roll(x, -1, 1)
        b = roll(a, -1, 0)
        return jnp.where(last_lane, b, a)

    def shift_down_c(x):
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        return jnp.where(first_lane, b, a)

    def plane_sum(s):
        return (s[0 * nbc:1 * nbc] + s[1 * nbc:2 * nbc]
                + s[2 * nbc:3 * nbc])

    def tile3c(p):
        return jnp.concatenate([p, p, p], axis=0)

    freem = freem_ref[:]
    uf = freem * u_ref[:] if bc else u_ref[:]
    cn = cnm_ref[:]
    d = uf - shift_up_c(uf)
    nd = tile3c(plane_sum(cn * d))
    fx = ckaxm_ref[:] * nd * cn + ckbdm_ref[:] * (d - nd * cn)
    out = fx - shift_down_c(fx)
    u_planes = (uf[0 * nbc:1 * nbc], uf[1 * nbc:2 * nbc],
                uf[2 * nbc:3 * nbc])

    def chunk_body(ci, out):
        sl2 = pl.ds(ci * 2 * JUMP_CHUNK, 2 * JUMP_CHUNK)
        slp = pl.ds(ci * JUMP_CHUNK, JUMP_CHUNK)
        ab_blk = ab_blk_ref[sl2, :].astype(f32)
        ab_lane = ab_lane_ref[sl2, :].astype(f32)
        jscal = jscal_ref[slp, :]
        jact1 = jact_ref[slp, :][:, 0:1]
        jn = (jscal[:, 0:1], jscal[:, 1:2], jscal[:, 2:3])
        jkax = jscal[:, 3:4] * jact1
        jkbd = jscal[:, 4:5] * jact1
        dj = []
        for k in range(3):
            t = jnp.dot(ab_blk, u_planes[k], precision=HI,
                        preferred_element_type=f32)
            sel = jnp.sum(t * ab_lane, axis=1, keepdims=True)
            dj.append(sel[:JUMP_CHUNK] - sel[JUMP_CHUNK:])
        ndj = jn[0] * dj[0] + jn[1] * dj[1] + jn[2] * dj[2]
        diffs = []
        for k in range(3):
            fj = jkax * ndj * jn[k] + jkbd * (dj[k] - ndj * jn[k])
            fj2 = jnp.concatenate([fj, -fj], axis=0)
            diffs.append(
                lax.dot_general(ab_blk, ab_lane * fj2, contract0,
                                precision=HI, preferred_element_type=f32))
        return out + jnp.concatenate(diffs, axis=0)

    out = lax.fori_loop(0, n_chunks, chunk_body, out)
    if bc:
        out_ref[:] = freem * (out + reg * uf) + (1.0 - freem) * u_ref[:]
    else:
        out_ref[:] = out


# ---------------------------------------------------------------------------
# tree-PC apply kernel
# ---------------------------------------------------------------------------

def _precond_kernel(nbc, nbt, npb, n_levels, r_star,
                    r_ref,
                    ascr_ref, bscr_ref, dinv_ref, ab0_ref, ab1_ref,
                    lvm_ref, pvm_ref,
                    fl_blk_ref, fl_lane_ref, at_blk_ref, at_lane_ref,
                    idp_blk_ref, idp_lane_ref, id2p_blk_ref, id2p_lane_ref,
                    slotcov_ref,
                    z_ref):
    f32 = jnp.float32

    def read9(ref, nb, base=0):
        return tuple(ref[pl.ds(base + k * nb, nb)] for k in range(9))

    def mv(M, v):
        return tuple(M[3 * i] * v[0] + M[3 * i + 1] * v[1]
                     + M[3 * i + 2] * v[2] for i in range(3))

    def m_t(M):
        return (M[0], M[3], M[6], M[1], M[4], M[7], M[2], M[5], M[8])

    def madd(A, B):
        return tuple(a + b for a, b in zip(A, B))

    def shift_p(x, s):
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, (-t) % BLOCK, 1)
        b0 = pltpu.roll(a, (nr - q) % nr, 0)
        b1 = pltpu.roll(a, (nr - q - 1) % nr, 0)
        return jnp.where(ln >= BLOCK - t, b1, b0)

    def shift_m(x, s):
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, t % BLOCK, 1)
        b0 = pltpu.roll(a, q, 0)
        b1 = pltpu.roll(a, (q + 1) % nr, 0)
        return jnp.where(ln < t, b1, b0)

    def tshift_p(T, s):
        return tuple(shift_p(t, s) for t in T)

    def tshift_m(T, s):
        return tuple(shift_m(t, s) for t in T)

    contract0 = (((0,), (0,)), ((), ()))
    RCHUNK = 1024
    idp = (idp_blk_ref, idp_lane_ref)
    id2p = (id2p_blk_ref, id2p_lane_ref)
    pp = npb * BLOCK

    def _move(blk_ref, lane_ref, id_pair, src_plane, dst_shape, row0,
              n_rows):
        # chunked as a fori_loop (NOT python-unrolled): every unrolled
        # chunk would mint its own plane-sized SSA values, each of which
        # Mosaic gives a dedicated spill slot
        n_ch = (n_rows + RCHUNK - 1) // RCHUNK

        def body(ci, out):
            sl = pl.ds(row0 + ci * RCHUNK, RCHUNK)
            tmp = jnp.dot(blk_ref[sl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * lane_ref[sl, :].astype(f32), axis=1,
                           keepdims=True)
            return out + lax.dot_general(
                id_pair[0][pl.ds(ci * RCHUNK, RCHUNK), :].astype(f32),
                id_pair[1][pl.ds(ci * RCHUNK, RCHUNK), :].astype(f32)
                * vals,
                contract0, precision=HI, preferred_element_type=f32)

        return lax.fori_loop(0, n_ch, body, jnp.zeros(dst_shape, f32))

    def _move_back(blk_ref, lane_ref, id_pair, src_plane, dst_shape, row0,
                   n_rows):
        n_ch = (n_rows + RCHUNK - 1) // RCHUNK

        def body(ci, out):
            sl = pl.ds(row0 + ci * RCHUNK, RCHUNK)
            isl = pl.ds(ci * RCHUNK, RCHUNK)
            tmp = jnp.dot(id_pair[0][isl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * id_pair[1][isl, :].astype(f32), axis=1,
                           keepdims=True)
            return out + lax.dot_general(
                blk_ref[sl, :].astype(f32),
                lane_ref[sl, :].astype(f32) * vals,
                contract0, precision=HI, preferred_element_type=f32)

        return lax.fori_loop(0, n_ch, body, jnp.zeros(dst_shape, f32))

    def gather_vec(blk_ref, lane_ref, dst_id, v, dst_nb, row0=0,
                   n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move(blk_ref, lane_ref, dst_id, comp,
                           (dst_nb, BLOCK), row0, n_rows) for comp in v)

    def scatter_vec(blk_ref, lane_ref, src_id, v, dst_nb, row0=0,
                    n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move_back(blk_ref, lane_ref, src_id, comp,
                                (dst_nb, BLOCK), row0, n_rows)
                     for comp in v)

    def pcr_update(rv, lvm):
        def round_body(k, rv):
            s = jnp.int32(1) << k
            a = read9(ascr_ref, nbt, k * 9 * nbt)
            b = read9(bscr_ref, nbt, k * 9 * nbt)
            upd = madd(mv(a, tshift_m(rv, s)), mv(b, tshift_p(rv, s)))
            return tuple(r - lvm * u for r, u in zip(rv, upd))

        rv = lax.fori_loop(0, r_star, round_body, rv)
        dinv = read9(dinv_ref, nbt)
        return tuple(lvm * y for y in mv(dinv, rv))

    zero_s = jnp.zeros((nbt, BLOCK), f32)
    r_chain = r_ref[:]
    rs = tuple(r_chain[c * nbc:c * nbc + nbt] for c in range(3))
    zs3 = (zero_s, zero_s, zero_s)
    attB0 = read9(ab0_ref, npb)
    attB1 = read9(ab1_ref, npb)

    def fwd_body(li, c):
        rs, y_all = c
        lvm = lvm_ref[pl.ds(li * nbt, nbt)]
        pvm = pvm_ref[pl.ds(li * npb, npb)]
        y = pcr_update(rs, lvm)
        y_all = madd(y_all, y)
        g = gather_vec(fl_blk_ref, fl_lane_ref, id2p, y, 2 * npb)
        g0 = tuple(comp[:npb] for comp in g)
        g1 = tuple(comp[npb:] for comp in g)
        corr0 = tuple(pvm * z for z in mv(attB0, g0))
        corr1 = tuple(pvm * z for z in mv(attB1, g1))
        sc0 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr0, nbt,
                          row0=0, n_rows=pp)
        sc1 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr1, nbt,
                          row0=pp, n_rows=pp)
        rs = tuple(r - a - b for r, a, b in zip(rs, sc0, sc1))
        return (rs, y_all)

    rs, y_all = lax.fori_loop(0, n_levels, fwd_body, (rs, zs3))

    def bwd_body(i, u_all):
        li = n_levels - 1 - i
        lvm = lvm_ref[pl.ds(li * nbt, nbt)]
        pvm = pvm_ref[pl.ds(li * npb, npb)]
        uj = gather_vec(at_blk_ref, at_lane_ref, id2p, u_all, 2 * npb)
        uj0 = tuple(comp[:npb] for comp in uj)
        uj1 = tuple(comp[npb:] for comp in uj)
        z0 = tuple(pvm * z for z in mv(m_t(attB0), uj0))
        z1 = tuple(pvm * z for z in mv(m_t(attB1), uj1))
        zs0 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z0, nbt,
                          row0=0, n_rows=pp)
        zs1 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z1, nbt,
                          row0=pp, n_rows=pp)
        zs = madd(zs0, zs1)
        u = tuple(lvm * (ya - pc)
                  for ya, pc in zip(y_all, pcr_update(zs, lvm)))
        return madd(u_all, u)

    u_all = lax.fori_loop(0, n_levels, bwd_body, zs3)
    if nbc > nbt:
        zpad = jnp.zeros((nbc - nbt, BLOCK), f32)
        z = jnp.concatenate(
            [jnp.concatenate([u_all[c], zpad], axis=0) for c in range(3)],
            axis=0)
    else:
        z = jnp.concatenate(list(u_all), axis=0)
    z_ref[:] = z + r_chain * (1.0 - slotcov_ref[:])


# ---------------------------------------------------------------------------
# host wrapper: XLA factorization + XLA CG over the two kernels
# ---------------------------------------------------------------------------

def pallas_tree_big_solve(model, chain_packed, tree_packed, active,
                          dy_top, dy_bot, x0, cfg: FeaConfig,
                          anchored=None, tree_factor_val=None):
    """One boundary-value solve: XLA factorization, XLA CG, split
    matvec/precond kernels."""
    from .bc import prescribed_values
    from .chain import plan_active_masks
    from .pallas_cg import _pack_plane, _tile3, pack_vec3, unpack_vec3
    from .solve import pcg
    from .tree_jax import tree_factor, tree_factor_fast

    plan = model.chain
    tplan = model.tree
    n = model.n_nodes
    nbc = chain_packed.cn.shape[0] // 3
    nbt = tree_packed.nbt
    npb = tree_packed.npb
    jp = chain_packed.jscal.shape[0]
    f32 = jnp.float32
    n_levels = tree_packed.n_levels
    r_star = max(tplan.meta.level_steps) if tplan.meta.level_steps else 0

    free = model.free_nodes if anchored is None \
        else jnp.logical_and(model.free_nodes, anchored)
    chain_act, jump_act = plan_active_masks(plan, active)
    cact = _tile3(_pack_plane(chain_act.astype(f32), nbc))
    jact_col = jnp.pad(jump_act.astype(f32), (0, jp - jump_act.shape[0]))
    jact = jnp.broadcast_to(jact_col[:, None], (jp, BLOCK))
    cnm = chain_packed.cn * cact
    ckaxm = chain_packed.ckax * cact
    ckbdm = chain_packed.ckbd * cact

    u_k = prescribed_values(model, dy_top, dy_bot).astype(f32)
    free3 = jnp.repeat(free[plan.perm].astype(f32)[:, None], 3, axis=1)
    freem = pack_vec3(free3, nbc)
    uk_p = pack_vec3(u_k[plan.perm], nbc)
    x0_p = pack_vec3(x0.astype(f32)[plan.perm], nbc)

    # factorization in XLA (gather-free fast path when available)
    reg_pc = max(cfg.reg, cfg.tree_reg_rel * tplan.meta.k_scale)
    if tree_factor_val is not None:
        factor = tree_factor_val
    elif getattr(model, "tree_fast", None) is not None:
        free_chain = free[plan.perm]
        factor = tree_factor_fast(tplan, model.tree_fast, plan, active,
                                  free, free_chain,
                                  jnp.asarray(reg_pc, f32), model.conn)
    else:
        factor = tree_factor(tplan, active, free,
                             jnp.asarray(reg_pc, f32), model.conn)
    ascr, bscr, dinv9, ab0, ab1 = _factor_planes(tplan, factor, nbt, npb,
                                                 r_star)

    interp = jax.default_backend() == "cpu"
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    params = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)

    mv_consts = (freem, cnm, ckaxm, ckbdm, chain_packed.ab_blk,
                 chain_packed.ab_lane, chain_packed.jscal, jact)

    def _mv_call(u, bc):
        kernel = functools.partial(_matvec_kernel, nbc, jp,
                                   np.float32(cfg.reg), bc)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * nbc, BLOCK), f32),
            in_specs=[vmem() for _ in range(1 + len(mv_consts))],
            out_specs=vmem(),
            compiler_params=params,
            interpret=interp,
        )(u, *mv_consts)

    def operator(u):
        return _mv_call(u, True)

    tp = tree_packed
    pc_kernel = functools.partial(_precond_kernel, nbc, nbt, npb,
                                  n_levels, r_star)
    pc_consts = (ascr, bscr, dinv9, ab0, ab1, tp.lvm, tp.pvm,
                 tp.fl_blk, tp.fl_lane, tp.at_blk, tp.at_lane,
                 tp.idp_blk, tp.idp_lane, tp.id2p_blk, tp.id2p_lane,
                 tp.slotcov)

    def precond(r):
        return pl.pallas_call(
            pc_kernel,
            out_shape=jax.ShapeDtypeStruct((3 * nbc, BLOCK), f32),
            in_specs=[vmem() for _ in range(1 + len(pc_consts))],
            out_specs=vmem(),
            compiler_params=params,
            interpret=interp,
        )(r, *pc_consts)

    # XLA CG on the packed plane vectors (same pcg as the pure-XLA path);
    # b = pin*uk - free*(K uk) with RAW K (pinned columns kept)
    pinm = 1.0 - freem
    b = pinm * uk_p - freem * _mv_call(uk_p, False)
    x_start = freem * x0_p + pinm * uk_p
    bnorm = jnp.sqrt(jnp.sum((freem * b) ** 2))
    res = pcg(operator, b, x_start, precond, cfg.rtol, cfg.atol,
              cfg.max_iter, bnorm=bnorm)
    x = unpack_vec3(res.x, n, nbc)[plan.inv_perm]
    return SolveResult(x=x.astype(model.coords.dtype), iters=res.iters,
                       resnorm=res.resnorm, converged=res.converged)