"""Hybrid solve for large meshes (309k+ DOF): XLA CG loop driving a
Pallas chain-matvec kernel, with the spanning-forest PC applied in XLA.

Why not one whole-solve kernel here: Mosaic's register allocator gives
every spilled plane-sized SSA value its own VMEM slot, and a kernel that
contains factorization + matvec + preconditioner + CG accumulates ~350 of
them (~80-90 MB measured at 309k DOF) — VMEM busts regardless of how small
the static tables are. And the unrolled multi-level PCR chains stall the
XLA TPU compile superlinearly past ~50k nodes (the trailing levels'
9/2-slot shapes are the trigger — measured, see tree_jax.pcr_split).

The hybrid therefore composes:

  - FACTORIZATION once per solve in XLA (tree_jax.tree_factor_fast — the
    gather-free path): one whale-level PCR + the dense junction-Schur
    tail inverse (meta.n_pcr levels only);
  - CG loop in XLA (solve.pcg on the packed plane vectors);
  - chain matvec as one kernel (shifts + jump one-hot matmuls) — the
    only per-iteration piece where kernel launch count matters;
  - tree-PC apply in XLA chain space (tree_jax.tree_apply_chain): one
    PCR level of plane shifts + one dense MXU matvec, plus the optional
    cluster coarse correction (cfg.tree_coarse_weight) that the old
    in-kernel PC could not offer.

Uses the unified chain==slot ordering. Selected by build_model when the
single-kernel estimate exceeds VMEM.

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
# host wrapper: XLA factorization + XLA CG over the matvec kernel
# ---------------------------------------------------------------------------

def pallas_tree_big_solve(model, chain_packed, active,
                          dy_top, dy_bot, x0, cfg: FeaConfig,
                          anchored=None, tree_factor_val=None):
    """One boundary-value solve: XLA factorization, XLA CG, Pallas chain
    matvec, XLA tree-PC apply (PCR whale level + dense tail)."""
    from .bc import prescribed_values
    from .chain import plan_active_masks_bool
    from .pallas_cg import _pack_plane, _tile3, pack_vec3, unpack_vec3
    from .solve import _coarse_chain_fn, compute_tree_factor, pcg
    from .tree_jax import tree_apply_chain_planes

    plan = model.chain
    n = model.n_nodes
    nbc = chain_packed.cn.shape[0] // 3
    jp = chain_packed.jscal.shape[0]
    f32 = jnp.float32

    free = model.free_nodes if anchored is None \
        else jnp.logical_and(model.free_nodes, anchored)
    # ONE plan-order bool gather each for active and free — shared with
    # the tree factorization below (each repeat cost ~0.8 ms on-device)
    chain_act_b, jump_act_b = plan_active_masks_bool(plan, active)
    free_chain_b = free[plan.perm]
    cact = _tile3(_pack_plane(chain_act_b.astype(f32), nbc))
    jact_col = jnp.pad(jump_act_b.astype(f32),
                       (0, jp - jump_act_b.shape[0]))
    jact = jnp.broadcast_to(jact_col[:, None], (jp, BLOCK))
    cnm = chain_packed.cn * cact
    ckaxm = chain_packed.ckax * cact
    ckbdm = chain_packed.ckbd * cact

    u_k = prescribed_values(model, dy_top, dy_bot).astype(f32)
    free3 = jnp.repeat(free_chain_b.astype(f32)[:, None], 3, axis=1)
    freem = pack_vec3(free3, nbc)
    uk_p = pack_vec3(u_k[plan.perm], nbc)
    x0_p = pack_vec3(x0.astype(f32)[plan.perm], nbc)

    # factorization in XLA (gather-free fast path; PCR levels + dense tail)
    factor = (tree_factor_val if tree_factor_val is not None
              else compute_tree_factor(model, active, cfg, anchored,
                                       free_chain=free_chain_b,
                                       chain_act_b=chain_act_b,
                                       jump_act_b=jump_act_b))

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

    # tree-PC apply in XLA chain space directly on the PACKED component
    # planes (a plane row-slice reshaped is the chain-ordered component
    # vector — no per-iteration (N,3) unpack/pack); optional coarse
    # correction, its dense inverse reused from the factor
    if cfg.tree_coarse_weight > 0.0:
        cc = _coarse_chain_fn(model, active, cfg, free,
                              ainv=factor.coarse_ainv)
        w = float(cfg.tree_coarse_weight)
    else:
        cc, w = None, 0.0
    S_tot = model.tree.n_slots

    def precond(r):
        rp = tuple(r[k * nbc:(k + 1) * nbc].reshape(-1) for k in range(3))
        up = tree_apply_chain_planes(model.tree, factor, rp)
        zp = [jnp.concatenate([up[k], rp[k][S_tot:]]) for k in range(3)]
        if cc is not None:
            zc = cc(jnp.stack([p[:n] for p in rp], axis=1))
            zp = [zp[k] + w * jnp.pad(zc[:, k], (0, nbc * BLOCK - n))
                  for k in range(3)]
        return jnp.concatenate([p.reshape(nbc, BLOCK) for p in zp], axis=0)

    # XLA CG on the packed plane vectors (same pcg as the pure-XLA path);
    # b = pin*uk - free*(K uk) with RAW K (pinned columns kept)
    pinm = 1.0 - freem
    b = pinm * uk_p - freem * _mv_call(uk_p, False)
    x_start = freem * x0_p + pinm * uk_p
    bnorm = jnp.sqrt(jnp.sum((freem * b) ** 2))
    res = pcg(operator, b, x_start, precond, cfg.rtol, cfg.atol,
              cfg.max_iter, bnorm=bnorm, n_restarts=cfg.cg_restarts)
    x = unpack_vec3(res.x, n, nbc)[plan.inv_perm]
    return SolveResult(x=x.astype(model.coords.dtype), iters=res.iters,
                       resnorm=res.resnorm, converged=res.converged)
