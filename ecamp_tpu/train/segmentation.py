"""Segmentation fine-tune task (SIIM / RSNA single, RIGA dual decoder).

Reference: Segmentation/train.py (AdamW + warmup-cosine, MixedLoss =
10*focal - log(dice), encoder frozen except seg_head, decoder trainable
:128-133; dice eval with empty-mask convention :191-213) and
train_RIGA.py (disc/cup mean loss :243-276).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core import config as cfglib
from ..core.dtypes import policy
from ..core.mesh import make_mesh, place_finetune_state
from ..nn.seg import SegViT, SegViTDual
from ..ops.losses import mixed_loss
from .eval_metrics import dice_scores
from .optim import make_optimizer, make_schedule
from .state import TrainState


def _seg_freeze_mask(params, freeze_encoder: bool):
    """True = trainable. Freezes encoder.trunk.* but keeps seg_head and
    decoder(s) trainable (Segmentation/train.py:128-133)."""
    if not freeze_encoder:
        return None

    def fn(path, _):
        keys = [getattr(k, "key", "") for k in path]
        return not (len(keys) >= 2 and keys[0] == "encoder" and keys[1] == "trunk")

    return jax.tree_util.tree_map_with_path(fn, params)


class SegmentationTask:
    def __init__(self, cfg: cfglib.SegmentationConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        pol = policy(cfg.bf16)
        self.dual = cfg.task.upper() == "RIGA"
        self.resnet = cfg.backbone == "resnet50"
        if self.resnet:
            # smp.Unet baseline path (Segmentation/train.py:139-180);
            # trains end-to-end — the reference freezes nothing here
            if self.dual:
                raise ValueError("resnet50 baseline supports single-decoder "
                                 "tasks only (SIIM/RSNA)")
            from ..nn.unet import ResNetUNet

            self.model = ResNetUNet(out_channels=cfg.out_channels,
                                    dtype=pol.compute_dtype)
        else:
            cls = SegViTDual if self.dual else SegViT
            self.model = cls(cfg.vit, out_channels=cfg.out_channels,
                             sample_rate=cfg.sample_rate,
                             features=tuple(cfg.decode_features),
                             dtype=pol.compute_dtype)
        self.schedule = make_schedule(cfg.optimizer)
        self._train_step = None
        self._eval_step = None

    def init_state(self, rng: jax.Array, pretrained: str = "",
                   from_pretrain: bool = True,
                   flavor: str = "ecamp") -> TrainState:
        """flavor: baseline checkpoint conventions of train_RIGA.py:110-138
        ('ecamp' | 'gloria' | 'random'; 'random' skips loading)."""
        c = self.cfg
        x = jnp.zeros((2, c.data.img_size, c.data.img_size, 3))
        variables = self.model.init(rng, x, train=False)
        if pretrained and flavor != "random":
            if self.resnet:
                from ..ckpt import import_resnet_unet

                variables, _, _ = import_resnet_unet(variables, pretrained)
            else:
                from ..ckpt import import_seg_vit

                variables, _, _ = import_seg_vit(variables, pretrained,
                                                 from_pretrain=from_pretrain,
                                                 flavor=flavor)
        # the resnet baseline trains end-to-end (no freeze branch in the
        # reference's smp path, Segmentation/train.py:139-180)
        mask = (None if self.resnet
                else _seg_freeze_mask(variables["params"], c.freeze_encoder))
        self.tx = make_optimizer(
            c.optimizer, freeze_mask=mask,
            # pallas_call does not partition TP-sharded leaves under GSPMD
            allow_fused=self.mesh.shape[self.mesh.axis_names[1]] == 1)
        state = TrainState.create(variables["params"], self.tx,
                                  batch_stats=variables.get("batch_stats"))
        return place_finetune_state(self.mesh, state)

    def _loss(self, params, batch_stats, images, masks, dropout_rng):
        from ..ops.image_ops import device_normalize_image

        # u8 pipe (--u8_pipe): quantized u8 shipped, normalize + channel
        # broadcast on-device; passthrough for the default f32 feeder
        images = device_normalize_image(images, self.cfg.data.mean,
                                        self.cfg.data.std)
        kwargs = ({} if self.resnet
                  else {"stop_trunk_grad": self.cfg.freeze_encoder})
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng}, **kwargs)
        if self.dual:
            # masks: (B, H, W, 2) disc/cup channels (train_RIGA.py:243-276)
            disc, cup = out
            loss = 0.5 * (
                mixed_loss(disc[..., 0], masks[..., 0],
                           self.cfg.mixed_loss_alpha, self.cfg.focal_gamma)
                + mixed_loss(cup[..., 0], masks[..., 1],
                             self.cfg.mixed_loss_alpha, self.cfg.focal_gamma))
        else:
            loss = mixed_loss(out[..., 0], masks[..., 0],
                              self.cfg.mixed_loss_alpha, self.cfg.focal_gamma)
        return loss, mutated["batch_stats"]

    def make_train_step(self):
        def step_fn(state: TrainState, images, masks):
            drng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed),
                                      state.step)
            (loss, new_stats), grads = jax.value_and_grad(
                self._loss, has_aux=True)(state.params, state.batch_stats,
                                          images, masks, drng)
            new_state = state.replace(tx=self.tx).apply_gradients(
                grads, batch_stats=new_stats)
            upd = state.step // max(1, self.cfg.optimizer.accum_steps)
            return new_state, {"loss": loss, "lr": self.schedule(upd)}

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, step_fn, donate_argnums=(0,))

    def train_step(self, state, images, masks):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step(state, images, masks)

    def make_eval_step(self):
        from ..ops.image_ops import device_normalize_image

        def eval_fn(params, batch_stats, images):
            images = device_normalize_image(images, self.cfg.data.mean,
                                            self.cfg.data.std)
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=False)
            if self.dual:
                return jax.nn.sigmoid(out[0]), jax.nn.sigmoid(out[1])
            return jax.nn.sigmoid(out)

        from ..core.mesh import tp_scoped_jit

        return tp_scoped_jit(self.mesh, eval_fn)

    def eval_step(self, state, images):
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        return self._eval_step(state.params, state.batch_stats, images)

    def compute_dice(self, probs: np.ndarray, truth: np.ndarray) -> np.ndarray:
        return dice_scores(np.asarray(probs), np.asarray(truth))
