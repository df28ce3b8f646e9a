"""Fused AdamW update (Pallas, TPU) with exact optax.adamw semantics.

The optax chain behind the pretrain optimizer (scale_by_adam ->
add_decayed_weights -> scale_by_learning_rate -> apply_updates;
reference: torch.optim.AdamW at main_pretrain.py:253-254) is purely
elementwise, but XLA schedules it as several loop fusions per leaf with
mu / nu / update / param each making separate HBM round trips. At
ViT-B + 6L-BERT scale (~180M fp32 params) the update is HBM-bound: the
roofline minimum is one read of (g, mu, nu, p) plus one write of
(mu', nu', p') = 28 bytes/param ~= 5 GB ~= 6 ms on v5e, while the
measured update cost by step difference is ~16 ms (DESIGN.md roofline
section). This kernel performs the whole update in a single VMEM pass
per leaf to close that gap.

Semantics are bit-faithful to optax.adamw's op ordering per element:
    mu'  = (1-b1)*g + b1*mu
    nu'  = (1-b2)*g^2 + b2*nu
    u    = (mu'/bc1) / (sqrt(nu'/bc2) + eps)      bc_i = 1 - b_i^(t+1)
    p'   = p - lr*(u + wd*p)       (wd only where the decay mask is True)
with lr = sched(t) evaluated at the pre-increment schedule count,
matching optax.scale_by_schedule. State layout is IDENTICAL to
optax.adamw (ScaleByAdamState, masked add_decayed_weights state,
ScaleByScheduleState), so orbax checkpoints and the torch AdamW-moment
importer (ckpt/torch_import.py) are unaffected, and any code path that
calls the standard (init, update) API still works — fused_apply is an
extra method used by TrainState.apply_gradients when present.

Global-norm clipping (the fine-tune default, max_grad_norm=1.0 as in
Classification/train.py's clip_grad_norm_) is supported by folding the
clip factor into the same pass: the norm itself is one XLA reduction
over the grads (identical cost to optax.clip_by_global_norm's), but the
scaled gradient is never materialized — the scale rides the SMEM
scalar vector into the kernel.

Opt-in: OptimizerConfig.fused_adamw or ECAMP_FUSED_ADAMW=1. Falls back
to the plain jnp formula (same math) on CPU and for small leaves.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# Below this many elements the pallas_call launch bookkeeping outweighs
# the fused pass; the jnp path compiles to one fusion anyway.
_MIN_PALLAS_ELEMS = 16384
_ROW_BLOCK = 1024  # (1024, 128) fp32 blocks: 7 operands x 512 KB VMEM


class FusedAdamW(NamedTuple):
    """optax.GradientTransformation plus a fused in-place apply."""

    init: Callable[[Any], Any]
    update: Callable[..., Any]
    fused_apply: Callable[[Any, Any, Any], Any]


def _leaf_update_jnp(g, m, v, p, lr, bc1, bc2, gdiv, gmul, b1, b2, eps, wd):
    g = g.astype(jnp.float32) / gdiv * gmul
    m32 = m.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    m_new = (1.0 - b1) * g + b1 * m32
    v_new = (1.0 - b2) * (g * g) + b2 * v32
    u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    if wd:
        u = u + wd * p32
    return (p32 - lr * u).astype(p.dtype), m_new.astype(m.dtype), \
        v_new.astype(v.dtype)


def _adamw_kernel(b1, b2, eps, wd, g_ref, m_ref, v_ref, p_ref, s_ref,
                  op_ref, om_ref, ov_ref):
    lr, bc1, bc2 = s_ref[0], s_ref[1], s_ref[2]
    gdiv, gmul = s_ref[3], s_ref[4]
    g = g_ref[:].astype(jnp.float32) / gdiv * gmul
    m = m_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.float32)
    m_new = (1.0 - b1) * g + b1 * m
    v_new = (1.0 - b2) * (g * g) + b2 * v
    u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    if wd:
        u = u + wd * p
    op_ref[:] = (p - lr * u).astype(op_ref.dtype)
    om_ref[:] = m_new.astype(om_ref.dtype)
    ov_ref[:] = v_new.astype(ov_ref.dtype)


def _leaf_update_pallas(g, m, v, p, scal, b1, b2, eps, wd):
    """scal: (5,) fp32 [lr, bc1, bc2, gdiv, gmul] (traced; shared across
    leaves). (gdiv, gmul) implement global-norm clipping as
    (g / gdiv) * gmul — (1, 1) when unclipped, (gnorm, clip) when
    clipped, the exact op order of optax.clip_by_global_norm — folded
    into the same VMEM pass so clipping costs no extra HBM traffic
    beyond the norm reduction itself."""
    n = p.size
    lanes = 128
    n_pad = -(-n // lanes) * lanes
    rows = n_pad // lanes
    block = min(_ROW_BLOCK, rows)
    rows_pad = -(-rows // block) * block

    def prep(x):
        x = x.reshape(-1)
        if rows_pad * lanes != n:
            x = jnp.pad(x, (0, rows_pad * lanes - n))
        return x.reshape(rows_pad, lanes)

    kernel = functools.partial(_adamw_kernel, float(b1), float(b2),
                               float(eps), float(wd))
    tile = pl.BlockSpec((block, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // block,),
        in_specs=[tile, tile, tile, tile,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((block, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((rows_pad, lanes), p.dtype),
                   jax.ShapeDtypeStruct((rows_pad, lanes), m.dtype),
                   jax.ShapeDtypeStruct((rows_pad, lanes), v.dtype)],
        # The padded (g, m, v, p) blocks are dead after the call; reuse
        # their HBM for the three outputs instead of fresh allocations.
        input_output_aliases={1: 1, 2: 2, 3: 0},
        cost_estimate=pl.CostEstimate(
            flops=12 * n, transcendentals=n,
            bytes_accessed=7 * n * 4),
    )(prep(g), prep(m), prep(v), prep(p), scal)
    p_new, m_new, v_new = (x.reshape(-1)[:n].reshape(p.shape) for x in out)
    return p_new, m_new, v_new


def _leaf_dispatch(g, m, v, p, scal, wd, b1, b2, eps, pallas_ok):
    """One leaf's update via the Pallas kernel (big leaves on TPU) or the
    single-fusion jnp formula. scal: (5,) [lr, bc1, bc2, gdiv, gmul]."""
    if pallas_ok and p.size >= _MIN_PALLAS_ELEMS:
        return _leaf_update_pallas(g, m, v, p, scal, b1, b2, eps, wd)
    return _leaf_update_jnp(g, m, v, p, scal[0], scal[1], scal[2], scal[3],
                            scal[4], b1, b2, eps, wd)


def _unzip3(triples):
    is_tup = lambda x: isinstance(x, tuple)
    return tuple(jax.tree_util.tree_map(lambda t: t[i], triples,
                                        is_leaf=is_tup) for i in range(3))


def _zero1_update(mesh, grads, mu, nu, params, scal, mask, weight_decay,
                  b1, b2, eps, pallas_ok):
    """One fused AdamW update with moments ZeRO-1-sharded over the data
    axis, as a shard_map region (see fused_adamw docstring). Slicing and
    gathering follow core/mesh.py::zero1_spec exactly so the in/out
    layouts match shard_opt_state_zero1's placement."""
    from jax.sharding import PartitionSpec as P

    from ..core.mesh import zero1_spec

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]

    def sharded_dim(shape):
        spec = zero1_spec(shape, axis, n)
        return len(spec) - 1 if len(spec) else -1

    dims = jax.tree_util.tree_map(lambda p: sharded_dim(p.shape), params)
    mom_specs = jax.tree_util.tree_map(
        lambda p: zero1_spec(p.shape, axis, n), params)
    rep_specs = jax.tree_util.tree_map(lambda _: P(), params)

    def region(g_tree, mu_tree, nu_tree, p_tree, scal_arr):
        idx = jax.lax.axis_index(axis)

        def leaf(g, m, v, p, decay, d):
            wd = weight_decay if decay else 0.0
            if d >= 0:
                size = p.shape[d] // n
                g = jax.lax.dynamic_slice_in_dim(g, idx * size, size, d)
                p_l = jax.lax.dynamic_slice_in_dim(p, idx * size, size, d)
            else:
                p_l = p
            p_new, m_new, v_new = _leaf_dispatch(g, m, v, p_l, scal_arr, wd,
                                                 b1, b2, eps, pallas_ok)
            if d >= 0:
                p_new = jax.lax.all_gather(p_new, axis, axis=d, tiled=True)
            return p_new, m_new, v_new

        return _unzip3(jax.tree_util.tree_map(leaf, g_tree, mu_tree, nu_tree,
                                              p_tree, mask, dims))

    return jax.shard_map(
        region, mesh=mesh,
        in_specs=(rep_specs, mom_specs, mom_specs, rep_specs, P()),
        out_specs=(rep_specs, mom_specs, mom_specs),
        check_vma=False)(grads, mu, nu, params, scal)


def fused_adamw(sched, b1: float, b2: float, eps: float,
                weight_decay: float, mask_fn: Optional[Callable] = None,
                grad_clip: Optional[float] = None,
                use_pallas: Optional[bool] = None,
                zero1_mesh=None) -> FusedAdamW:
    """Drop-in optax.adamw with an extra fused_apply(grads, opt_state,
    params) -> (new_params, new_opt_state) used by TrainState.

    grad_clip: optional global-norm clip, fused as a scalar grad scale
    inside the same kernel pass (state layout = optax.chain(
    clip_by_global_norm, adamw), matching make_optimizer's chain).

    zero1_mesh: when the optimizer state is ZeRO-1-sharded over the
    mesh's data axis (core/mesh.py::shard_opt_state_zero1), a bare
    pallas_call cannot be partitioned by GSPMD. Passing the mesh makes
    fused_apply run the update inside a jax.shard_map region instead:
    each device updates only its moment shard (slicing the replicated
    grads/params at its axis index), then all-gathers the param slices
    back to replicated — the same compute/communication schedule GSPMD
    derives for the optax path, with the kernel running shard-local.
    In/out layouts are unchanged (params replicated, moments sharded by
    zero1_spec), so place_state and the step's output sharding
    constraints are unaffected."""
    adam = optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay,
                       mask=mask_fn if weight_decay > 0 else None)
    # Chain-wrap even without a clip: make_optimizer's non-fused path is
    # always `optax.chain(*pre, tx, *post)`, which wraps the adamw state
    # tuple in an outer 1-tuple — matching it keeps orbax checkpoints
    # restorable across the ECAMP_FUSED_ADAMW=0/1 boundary both ways.
    if grad_clip is not None:
        base = optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    else:
        base = optax.chain(adam)

    def fused_apply(grads, opt_state, params):
        pallas_ok = use_pallas
        if pallas_ok is None:
            pallas_ok = jax.default_backend() == "tpu" and pltpu is not None
        inner = opt_state[-1]  # the adamw tuple inside the chain wrap
        adam_state = inner[0]
        sched_state = inner[-1]
        count_inc = optax.safe_int32_increment(adam_state.count)
        cf = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** cf
        bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** cf
        lr = jnp.asarray(sched(sched_state.count), jnp.float32)
        if grad_clip is not None:
            # optax.clip_by_global_norm semantics, bit-for-bit: when the
            # norm exceeds the bound apply (g / gnorm) * clip in that op
            # order (NaN norms propagate, as there).
            gnorm = optax.global_norm(grads)
            trigger = gnorm < grad_clip
            gdiv = jnp.where(trigger, 1.0, gnorm)
            gmul = jnp.where(trigger, 1.0, grad_clip)
        else:
            gdiv = gmul = jnp.float32(1.0)
        scal = jnp.stack([lr, bc1, bc2,
                          jnp.asarray(gdiv, jnp.float32),
                          jnp.asarray(gmul, jnp.float32)])
        if weight_decay > 0 and mask_fn is not None:
            mask = mask_fn(params)
        else:
            mask = jax.tree_util.tree_map(lambda _: weight_decay > 0, params)

        if zero1_mesh is not None:
            new_params, new_mu, new_nu = _zero1_update(
                zero1_mesh, grads, adam_state.mu, adam_state.nu, params,
                scal, mask, weight_decay, b1, b2, eps, pallas_ok)
        else:
            def leaf(g, m, v, p, decay):
                wd = weight_decay if decay else 0.0
                return _leaf_dispatch(g, m, v, p, scal, wd,
                                      b1, b2, eps, pallas_ok)

            new_params, new_mu, new_nu = _unzip3(
                jax.tree_util.tree_map(leaf, grads, adam_state.mu,
                                       adam_state.nu, params, mask))
        new_inner = (
            adam_state._replace(count=count_inc, mu=new_mu, nu=new_nu),
            *inner[1:-1],
            sched_state._replace(
                count=optax.safe_int32_increment(sched_state.count)),
        )
        return new_params, (*opt_state[:-1], new_inner)

    return FusedAdamW(init=base.init, update=base.update,
                      fused_apply=fused_apply)
