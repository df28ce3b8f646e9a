"""Ablation timings for the pretrain step on real hardware.

Times the full jitted train step under several ablations to attribute the
step-time remainder (DESIGN.md roofline): dropout off, flash forced,
fwd-only, loss subsets. Prints one line per variant.

Usage: python tools/ablate_step.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
WARM, STEPS = 3, 10


def _sync(out):
    # float() sync on the first scalar leaf: one executable produces all
    # outputs, so fetching any of them awaits the whole computation.
    # (block_until_ready is unreliable through the remote-TPU transport.)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def timeit(fn, *args):
    for _ in range(WARM):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def main():
    from ecamp_tpu.core import config as cfg
    from ecamp_tpu.train.pretrain import PretrainTask

    pcfg = cfg.PretrainConfig()
    task = PretrainTask(pcfg, steps_per_epoch=1000)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = pcfg.max_caption_length
    batch = task.shard_batch({
        "image": rng.normal(size=(BATCH, 448, 448, 3)).astype(np.float32),
        "ids": rng.integers(0, 30000, (BATCH, L)).astype(np.int32),
        "labels": rng.integers(0, 30000, (BATCH, L)).astype(np.int32),
        "attention_mask": np.ones((BATCH, L), np.int32),
        "type_ids": np.zeros((BATCH, L), np.int32),
        "weights": np.ones((BATCH, L), np.float32),
        "column": np.ones((BATCH,), np.int32),
        "row": np.ones((BATCH,), np.int32),
    })
    key = jax.random.PRNGKey(1)

    # full train step (state is donated — thread it through a holder)
    holder = {"state": state}

    def full(batch, key):
        s, m = task.train_step(holder["state"], batch, key)
        holder["state"] = s
        return m["loss"]

    dt = timeit(full, batch, key)
    print(f"full_step      {dt*1e3:8.2f} ms  {BATCH/dt:7.1f} img/s")
    state = holder["state"]
    params = state.params

    # forward-only (train-mode dropout, no grad)
    model = task.model

    @jax.jit
    def fwd_train(params, batch, seed):
        dk = jax.random.key(seed, impl="unsafe_rbg")
        out = model.apply({"params": params}, batch, mask_ratio=pcfg.mask_ratio,
                          deterministic=False,
                          rngs={"masking": jax.random.PRNGKey(0),
                                "dropout": dk})
        return out["mim_loss"] + out["res_loss"] + out["mlm_loss"]

    dt = timeit(fwd_train, params, batch, jax.numpy.uint32(7))
    print(f"fwd_train      {dt*1e3:8.2f} ms")

    @jax.jit
    def fwd_eval(params, batch):
        out = model.apply({"params": params}, batch, mask_ratio=pcfg.mask_ratio,
                          deterministic=True,
                          rngs={"masking": jax.random.PRNGKey(0)})
        return out["mim_loss"] + out["res_loss"] + out["mlm_loss"]

    dt = timeit(fwd_eval, params, batch)
    print(f"fwd_eval       {dt*1e3:8.2f} ms   (dropout off)")

    # grad-only (no optimizer update)
    @jax.jit
    def grad_only(params, batch, seed):
        def loss_fn(p):
            dk = jax.random.key(seed, impl="unsafe_rbg")
            out = model.apply({"params": p}, batch, mask_ratio=pcfg.mask_ratio,
                              deterministic=False,
                              rngs={"masking": jax.random.PRNGKey(0),
                                    "dropout": dk})
            return out["mim_loss"] + out["res_loss"] + out["mlm_loss"]

        # return grads as real outputs so XLA cannot DCE the backward
        return jax.value_and_grad(loss_fn)(params)

    dt = timeit(grad_only, params, batch, jax.numpy.uint32(7))
    print(f"fwd+bwd        {dt*1e3:8.2f} ms")

    @jax.jit
    def grad_eval(params, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, mask_ratio=pcfg.mask_ratio,
                              deterministic=True,
                              rngs={"masking": jax.random.PRNGKey(0)})
            return out["mim_loss"] + out["res_loss"] + out["mlm_loss"]

        # return grads as real outputs so XLA cannot DCE the backward
        return jax.value_and_grad(loss_fn)(params)

    dt = timeit(grad_eval, params, batch)
    print(f"fwd+bwd nodrop {dt*1e3:8.2f} ms")

    # per-loss grads (dropout on)
    for name in ("mim", "res", "mlm"):
        @jax.jit
        def g1(params, batch, seed, name=name):
            def loss_fn(p):
                dk = jax.random.key(seed, impl="unsafe_rbg")
                out = model.apply({"params": p}, batch, mask_ratio=pcfg.mask_ratio,
                                  deterministic=False,
                                  rngs={"masking": jax.random.PRNGKey(0),
                                        "dropout": dk})
                return out[f"{name}_loss"]

            return jax.value_and_grad(loss_fn)(params)

        dt = timeit(g1, params, batch, jax.numpy.uint32(7))
        print(f"fwd+bwd {name}    {dt*1e3:8.2f} ms")

    adamw_only(task, state)


def adamw_only(task, state):
    import jax.numpy as jnp

    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-6,
                                   state.params)

    @jax.jit
    def upd(state, grads):
        new_state = state.replace(tx=task.tx).apply_gradients(grads)
        return new_state.params

    dt = timeit(upd, state, grads)
    print(f"adamw_only     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
