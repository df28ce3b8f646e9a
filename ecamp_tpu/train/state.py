"""Train state pytree (params + optimizer + batch stats + step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False,
                                                         default=None)

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats, tx=tx)

    def apply_gradients(self, grads, batch_stats=None):
        fused = getattr(self.tx, "fused_apply", None)
        if fused is not None:
            new_params, new_opt = fused(grads, self.opt_state, self.params)
        else:
            updates, new_opt = self.tx.update(grads, self.opt_state,
                                              self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt,
                            batch_stats=(batch_stats if batch_stats is not None
                                         else self.batch_stats))

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
