"""Run the reference's Classification/train.py functions in-process on
CPU (VERDICT r2 #1: end-to-end training parity evidence).

The reference code itself is imported from /root/reference and executed
unmodified; only its missing third-party imports are satisfied by stubs
(timm_stub / tv_stub / apex / ipdb) and DataLoader workers are forced to
0 for this 1-core box (math-neutral)."""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys
import types
from argparse import Namespace

REF_CLS = "/root/reference/ECAMP/Fine-tuning/Classification"
REF_SEG = "/root/reference/ECAMP/Fine-tuning/Segmentation"
REF_DET = "/root/reference/ECAMP/Fine-tuning/Detection"
REF_PRE = "/root/reference/ECAMP/Pre-training"
REF_VIZ = "/root/reference/Visualization"


def _install_stubs():
    from . import timm_stub, tv_stub

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.VisionTransformer = timm_stub.VisionTransformer
    vt.PatchEmbed = timm_stub.PatchEmbed
    vt.Block = timm_stub.Block
    layers = types.ModuleType("timm.models.layers")
    layers.to_2tuple = timm_stub.to_2tuple
    layers.trunc_normal_ = timm_stub.trunc_normal_
    layers.DropPath = timm_stub.DropPath
    timm.models = models
    models.vision_transformer = vt
    models.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.vision_transformer", vt)
    sys.modules.setdefault("timm.models.layers", layers)

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "RandomResizedCrop", "RandomHorizontalFlip",
                 "Grayscale", "Resize", "CenterCrop", "ToTensor",
                 "Normalize"):
        setattr(transforms, name, getattr(tv_stub, name))
    datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = transforms
    tv.datasets = datasets
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", transforms)
    sys.modules.setdefault("torchvision.datasets", datasets)

    apex = types.ModuleType("apex")
    amp = types.ModuleType("apex.amp")
    parallel = types.ModuleType("apex.parallel")

    def _unused(*a, **k):  # CPU path never reaches apex (args.fp16 False)
        raise RuntimeError("apex stub called — fp16 must stay off")

    amp.initialize = _unused
    amp.scale_loss = _unused
    amp.master_params = _unused
    parallel.DistributedDataParallel = _unused
    apex.amp = amp
    apex.parallel = parallel
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.amp", amp)
    sys.modules.setdefault("apex.parallel", parallel)

    sys.modules.setdefault("ipdb", types.ModuleType("ipdb"))

    # Pre-training extras: util/misc.py imports the torch._six shim
    # (removed in torch>=1.13; only `inf` is used, for grad norms) and
    # main_pretrain.py builds AdamW param groups via timm's
    # add_weight_decay (timm absent here; same split semantics: no decay
    # for 1-d params and biases, frozen params excluded).
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.inf = float("inf")
        sys.modules["torch._six"] = six

    def _add_weight_decay(model, weight_decay=1e-5, skip_list=()):
        decay, no_decay = [], []
        for name, param in model.named_parameters():
            if not param.requires_grad:
                continue
            if (len(param.shape) == 1 or name.endswith(".bias")
                    or name in skip_list):
                no_decay.append(param)
            else:
                decay.append(param)
        return [{"params": no_decay, "weight_decay": 0.0},
                {"params": decay, "weight_decay": weight_decay}]

    timm_mod = sys.modules["timm"]
    if not hasattr(timm_mod, "optim"):
        optim = types.ModuleType("timm.optim")
        factory = types.ModuleType("timm.optim.optim_factory")
        factory.add_weight_decay = _add_weight_decay
        optim.optim_factory = factory
        timm_mod.optim = optim
        sys.modules["timm.optim"] = optim
        sys.modules["timm.optim.optim_factory"] = factory

    from . import alb_stub

    alb = types.ModuleType("albumentations")
    for name in ("Compose", "Normalize", "Resize", "ShiftScaleRotate"):
        setattr(alb, name, getattr(alb_stub, name))
    alb_pt = types.ModuleType("albumentations.pytorch")
    alb_pt.ToTensorV2 = alb_stub.ToTensorV2
    alb.pytorch = alb_pt
    sys.modules.setdefault("albumentations", alb)
    sys.modules.setdefault("albumentations.pytorch", alb_pt)

    smp = types.ModuleType("segmentation_models_pytorch")

    def _no_smp(*a, **k):
        raise RuntimeError("smp stub called — only the SegViT path is "
                           "driven in-place")

    smp.Unet = _no_smp
    sys.modules.setdefault("segmentation_models_pytorch", smp)

    # Detection extras: ColorJitter (constructed, never applied),
    # torchvision.models.resnet (DetResNet50 subclasses ResNet at import
    # time; the class body must exist, instantiation is out of scope),
    # ml_collections (dead get_b16_config import), torchmetrics mAP.
    transforms.ColorJitter = tv_stub.ColorJitter
    tvm = types.ModuleType("torchvision.models")
    tvm_resnet = types.ModuleType("torchvision.models.resnet")

    class _StubResNet:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision ResNet stub instantiated — "
                               "only the ViT det path is driven in-place")

    import torch.nn as _nn

    class _StubResNetModule(_StubResNet, _nn.Module):
        pass

    tvm_resnet.ResNet = _StubResNetModule
    tvm_resnet.Bottleneck = object
    tvm.resnet = tvm_resnet
    sys.modules["torchvision"].models = tvm
    sys.modules.setdefault("torchvision.models", tvm)
    sys.modules.setdefault("torchvision.models.resnet", tvm_resnet)

    mlc = types.ModuleType("ml_collections")
    mlc.ConfigDict = dict
    sys.modules.setdefault("ml_collections", mlc)

    tt = types.ModuleType("terminaltables")
    tt.AsciiTable = None  # imported by detection_utils, used only in its
    sys.modules.setdefault("terminaltables", tt)  # __main__ smoke block

    from . import tm_stub

    tm = types.ModuleType("torchmetrics")
    tm_det = types.ModuleType("torchmetrics.detection")
    tm_det.MeanAveragePrecision = tm_stub.MeanAveragePrecision
    tm.detection = tm_det
    sys.modules.setdefault("torchmetrics", tm)
    sys.modules.setdefault("torchmetrics.detection", tm_det)

    # Stub modules need a (loader-less) __spec__: transformers probes
    # importlib.util.find_spec("apex") at import time, which raises
    # ValueError on a module whose __spec__ is None.
    for name in ("timm", "timm.models", "timm.models.vision_transformer",
                 "timm.models.layers", "timm.optim",
                 "timm.optim.optim_factory", "torchvision",
                 "torchvision.transforms", "torchvision.datasets",
                 "torchvision.models", "torchvision.models.resnet", "apex",
                 "apex.amp", "apex.parallel", "ipdb", "ml_collections",
                 "terminaltables", "torchmetrics", "torchmetrics.detection",
                 "albumentations", "albumentations.pytorch",
                 "segmentation_models_pytorch", "torch._six"):
        stub = sys.modules.get(name)
        if stub is not None and getattr(stub, "__spec__", None) is None:
            stub.__spec__ = importlib.machinery.ModuleSpec(name, None)

    # seg models_vit imports torchvision.transforms.functional
    tvf = sys.modules.get("torchvision.transforms.functional")
    if tvf is None:
        tvf = types.ModuleType("torchvision.transforms.functional")

        class InterpolationMode:
            NEAREST = "nearest"
            BILINEAR = "bilinear"
            BICUBIC = "bicubic"

        tvf.InterpolationMode = InterpolationMode
        sys.modules["torchvision.transforms.functional"] = tvf
        sys.modules["torchvision"].transforms.functional = tvf


def _transformers_compat():
    """Back-fill symbols the reference Pre-training code uses from their
    pre-2023 locations: transformers.modeling_utils.apply_chunking_to_forward
    (moved to pytorch_utils in HF 4.26; module/context_fusion.py) and the
    np.float builtin alias (removed in numpy 2; util/pos_embed.py:56)."""
    import numpy as _np
    import transformers.modeling_utils as mu

    if not hasattr(mu, "apply_chunking_to_forward"):
        from transformers.pytorch_utils import apply_chunking_to_forward

        mu.apply_chunking_to_forward = apply_chunking_to_forward
    if not hasattr(_np, "float"):
        _np.float = float


def _import_ref_train(ref_dir: str = REF_CLS, modname: str = "ref_cls_train",
                      entry: str = "train.py"):
    """Import <ref_dir>/<entry> as `modname`. The Classification and
    Segmentation dirs both define top-level `models_vit` and `utils.*`
    modules (and Pre-training its own `util`/`module` packages), so any
    previously-imported copies are purged and sys.path is re-ordered
    before loading."""
    _install_stubs()
    for other in (REF_CLS, REF_SEG, REF_DET, REF_PRE, REF_VIZ):
        while other in sys.path:
            sys.path.remove(other)
    for name in list(sys.modules):
        if name in ("models_vit", "utils", "detector_backbone_vit",
                    "detector_backbone_resnet", "detector_model",
                    "util", "module") or \
                name.startswith(("utils.", "util.", "module.")):
            del sys.modules[name]
    sys.path.insert(0, ref_dir)
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(ref_dir, entry))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def run_reference_cls(workdir: str, pretrained_path: str, *,
                      model_name: str, num_classes: int = 1,
                      task: str = "RSNA", img_size: int = 64,
                      train_batch_size: int = 8, eval_batch_size: int = 16,
                      num_steps: int = 36, warmup_steps: int = 6,
                      learning_rate: float = 3e-3, seed: int = 42,
                      tiny_factory=None, mode: str = "Finetune",
                      out_name: str = "ref_out"):
    """Drive reference setup() + train() + test(). Returns a dict with
    the validation trajectory [(step, auc, loss)...] and the final test
    AUROC. `tiny_factory(**kwargs) -> models_vit.VisionTransformer` is
    registered under `model_name` (the stock factories hardcode dims too
    large for CPU; the factory must use the reference's own subclass)."""
    mod = _import_ref_train()
    models_vit = sys.modules["models_vit"]
    if tiny_factory is not None:
        models_vit.__dict__[model_name] = tiny_factory

    # num_workers=16 is hardcoded in get_loader; neutralize for 1 core
    import torch.utils.data as tud
    du = sys.modules["utils.data_utils"]
    real_loader = tud.DataLoader

    def loader0(*a, **k):
        k["num_workers"] = 0
        k.pop("pin_memory", None)
        k.pop("prefetch_factor", None)
        return real_loader(*a, **k)

    du.DataLoader = loader0

    traj = []
    real_valid = mod.valid

    def recording_valid(args, model, writer, loader, global_step):
        res, loss = real_valid(args, model, writer, loader, global_step)
        traj.append((int(global_step), float(res), float(loss)))
        return res, loss

    mod.valid = recording_valid

    aucs_seen = []
    real_auc = mod.auc

    def recording_auc(prop, label, n):
        out = real_auc(prop, label, n)
        aucs_seen.append([float(a) for a in out])
        return out

    mod.auc = recording_auc

    args = Namespace(
        name="parity", stage="train", model=model_name, task=task,
        num_classes=num_classes, dataset_path=os.path.join(workdir, "imgs"),
        data_volume="100", output_dir=os.path.join(workdir, out_name),
        img_size=img_size, ratio=1.0, train_batch_size=train_batch_size,
        eval_batch_size=eval_batch_size, learning_rate=learning_rate,
        weight_decay=0.0, num_steps=num_steps, decay_type="cosine",
        warmup_steps=warmup_steps, max_grad_norm=1.0, local_rank=-1,
        seed=seed, gradient_accumulation_steps=1, fp16=False,
        fp16_opt_level="O2", loss_scale=0, device="cpu", n_gpu=0,
        pretrained_path=pretrained_path, mode=mode)
    os.makedirs(args.output_dir, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(workdir)  # XRAY opens ./datasets/<task>/... relative to CWD
    try:
        args, model = mod.setup(args)
        mod.train(args, model)
        mod.test(args)
    finally:
        os.chdir(cwd)
        mod.valid = real_valid
        mod.auc = real_auc
        du.DataLoader = real_loader
    test_auc = (float(sum(aucs_seen[-1]) / len(aucs_seen[-1]))
                if aucs_seen else float("nan"))
    return {"val_trajectory": traj, "test_auc": test_auc}


def run_reference_seg(workdir: str, pretrained_path: str, *,
                      hidden_size: int = 64, num_layers: int = 2,
                      num_heads: int = 4,
                      decode_features=(16, 16, 8, 8),
                      train_batch_size: int = 8, eval_batch_size: int = 8,
                      num_steps: int = 36, warmup_steps: int = 6,
                      learning_rate: float = 2e-4, seed: int = 42):
    """Drive the reference Segmentation/train.py (SIIM / SegViT path:
    setup + train + test) with tiny SegViT dims (the stock call hardcodes
    ViT-B; the wrapper overrides dims only, the reference's own
    SegViT/Decoder classes and trainer run unmodified). Returns the val
    dice trajectory and the final test dice."""
    import numpy as np

    mod = _import_ref_train(REF_SEG, "ref_seg_train")
    real_segvit = mod.SegViT

    def tiny_segvit(**kwargs):
        kwargs.update(hidden_size=hidden_size,
                      num_hidden_layers=num_layers,
                      num_attention_heads=num_heads,
                      decode_features=list(decode_features))
        return real_segvit(**kwargs)

    mod.SegViT = tiny_segvit

    import torch.utils.data as tud
    du = sys.modules["utils.data_utils"]
    real_loader = tud.DataLoader

    def loader0(*a, **k):
        k["num_workers"] = 0
        k.pop("pin_memory", None)
        k.pop("prefetch_factor", None)
        return real_loader(*a, **k)

    du.DataLoader = loader0

    traj = []
    real_valid = mod.valid

    def recording_valid(args, model, writer, loader, global_step):
        res, loss = real_valid(args, model, writer, loader, global_step)
        traj.append((int(global_step), float(res), float(loss)))
        return res, loss

    mod.valid = recording_valid

    dice_record = []
    real_get_dice = mod.get_dice

    def recording_get_dice(prob, truth, threshold=0.5):
        out = real_get_dice(prob, truth, threshold)
        dice_record.append(np.asarray(out))
        return out

    args = Namespace(
        name="parity", stage="train", model="vit_base_patch16", task="SIIM",
        num_classes=1, dataset_path=os.path.join(workdir, "imgs"),
        data_volume="100", output_dir=os.path.join(workdir, "ref_out"),
        img_size=224, train_batch_size=train_batch_size,
        eval_batch_size=eval_batch_size, learning_rate=learning_rate,
        weight_decay=0.05, num_steps=num_steps, decay_type="cosine",
        warmup_steps=warmup_steps, max_grad_norm=1.0, local_rank=-1,
        seed=seed, gradient_accumulation_steps=1, fp16=False,
        fp16_opt_level="O2", loss_scale=0, device="cpu", n_gpu=0,
        start_eval=1, pretrained_path=pretrained_path)
    os.makedirs(args.output_dir, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(workdir)  # SIIM dataset opens ./datasets/SIIM/... rel to CWD
    try:
        args, model = mod.setup(args)
        mod.train(args, model)
        args.pretrained_path = os.path.join(
            args.output_dir, "parity_bestdice_checkpoint.bin")
        args.stage = "test"
        args, model = mod.setup(args)
        test_loader = mod.get_loader(args)
        mod.get_dice = recording_get_dice
        mod.test(args, model, test_loader)
    finally:
        os.chdir(cwd)
        mod.valid = real_valid
        mod.get_dice = real_get_dice
        mod.SegViT = real_segvit
        du.DataLoader = real_loader
    test_dice = (float(np.concatenate(dice_record).mean())
                 if dice_record else float("nan"))
    return {"val_trajectory": traj, "test_dice": test_dice}


def run_reference_det(workdir: str, pretrained_path: str, *,
                      hidden_size: int = 64, num_layers: int = 2,
                      num_heads: int = 4, img_size: int = 64,
                      train_batch_size: int = 8, eval_batch_size: int = 8,
                      num_steps: int = 24, warmup_steps: int = 4,
                      learning_rate: float = 5e-4, seed: int = 42):
    """Drive the reference Detection/train.py (ViT path: setup + train +
    test) with tiny encoder dims. The reference's own ViTDetector /
    DetectionLayers / ModelMain / YOLOLoss / non_max_suppression run
    unmodified (the 512/1024/2048 neck+head channels stay stock); only
    the inner timm VisionTransformer gets img_size/dim overrides, and
    mAP uses the tm_stub (torchmetrics absent here — see tm_stub).

    DataLoader workers are forced to 1 (not 0): RSNADetectionDataset
    mutates its stored bboxes in-place per __getitem__
    (my_dataset.py:96-99), which deployed num_workers=16 confines to
    per-epoch worker copies; num_workers=0 would compound the division
    across epochs and diverge from deployed semantics.

    Returns the val mAP trajectory and the final test mAP."""
    mod = _import_ref_train(REF_DET, "ref_det_train")
    # detector_backbone_vit.ViTDetector builds its inner VisionTransformer
    # without an img_size argument (224 default); inject the tiny img_size
    # at the timm base class (the subclass does a late-bound
    # `super(VisionTransformer, self)` so the module global can't be
    # swapped for a wrapper).
    timm_base = sys.modules["timm.models.vision_transformer"].VisionTransformer
    real_base_init = timm_base.__init__

    def sized_init(self, *a, **k):
        k.setdefault("img_size", img_size)
        real_base_init(self, *a, **k)

    timm_base.__init__ = sized_init
    real_detector = mod.ViTDetector

    def tiny_detector(**kwargs):
        kwargs.update(hidden_size=hidden_size,
                      num_hidden_layers=num_layers,
                      num_attention_heads=num_heads)
        return real_detector(**kwargs)

    mod.ViTDetector = tiny_detector

    import torch.utils.data as tud
    du = sys.modules["utils.data_utils"]
    real_loader = tud.DataLoader

    def loader1(*a, **k):
        k["num_workers"] = 1
        k.pop("pin_memory", None)
        k.pop("prefetch_factor", None)
        return real_loader(*a, **k)

    du.DataLoader = loader1

    traj = []
    real_valid = mod.valid

    def recording_valid(args, model, writer, loader, global_step):
        res = real_valid(args, model, writer, loader, global_step)
        traj.append((int(global_step), float(res)))
        return res

    mod.valid = recording_valid

    maps_seen = []
    real_map_cls = mod.MeanAveragePrecision

    class RecordingMAP(real_map_cls):
        def compute(self):
            out = super().compute()
            maps_seen.append(float(out["map"]))
            return out

    mod.MeanAveragePrecision = RecordingMAP

    args = Namespace(
        name="ecamp", stage="train", model="vit_base_tiny", task="RSNA",
        num_classes=1, dataset_path=os.path.join(workdir, "imgs"),
        data_volume="100", output_dir=os.path.join(workdir, "ref_out_det"),
        img_size=img_size, train_batch_size=train_batch_size,
        eval_batch_size=eval_batch_size, learning_rate=learning_rate,
        weight_decay=1e-6, num_steps=num_steps, decay_type="cosine",
        warmup_steps=warmup_steps, max_grad_norm=1.0, local_rank=-1,
        seed=seed, gradient_accumulation_steps=1, fp16=False,
        fp16_opt_level="O2", loss_scale=0, device="cpu", n_gpu=0,
        start_eval=1, resume=0, pretrained_path=pretrained_path)
    os.makedirs(args.output_dir, exist_ok=True)

    cwd = os.getcwd()
    os.chdir(workdir)  # RSNA csv opened as ./RSNA/... relative to CWD
    try:
        mod.set_seed(args)
        args, model = mod.setup(args)
        mod.train(args, model)
        args.pretrained_path = os.path.join(
            args.output_dir, "ecamp_bestmap_checkpoint.bin")
        args.stage = "test"
        args, model = mod.setup(args)
        test_loader = mod.get_loader(args)
        mod.test(args, model, test_loader)
    finally:
        os.chdir(cwd)
        mod.valid = real_valid
        mod.ViTDetector = real_detector
        mod.MeanAveragePrecision = real_map_cls
        timm_base.__init__ = real_base_init
        du.DataLoader = real_loader
    test_map = maps_seen[-1] if maps_seen else float("nan")
    return {"val_trajectory": traj, "test_map": test_map}


def run_reference_pretrain(data_root: str, init_out: str = None, *,
                           embed_dim: int = 64, depth: int = 2,
                           num_heads: int = 4, decoder_embed_dim: int = 64,
                           decoder_depth: int = 1, decoder_num_heads: int = 4,
                           bert_hidden: int = 64, bert_layers: int = 2,
                           bert_heads: int = 4, bert_intermediate: int = 128,
                           max_caption_length: int = 128, batch_size: int = 4,
                           epochs: int = 3, max_epoch: int = 4,
                           warmup_epochs: float = 1.0, lr: float = 2e-3,
                           min_lr: float = 0.0, weight_decay: float = 0.05,
                           mask_ratio: float = 0.75, accum_iter: int = 1,
                           seed: int = 42):
    """Drive the reference Pre-training loop in-process on CPU: its own
    ContextBertDataset/collate, ECAMP model (3-loss forward), timm-style
    AdamW param groups, NativeScaler and per-iteration cosine LR
    (main_pretrain.py train_one_epoch, unmodified) with tiny dims at the
    REAL 448/224 image geometry. The only substitutions are missing/
    changed third-party behavior (tv/timm stubs, OldBertSelfAttention —
    see hf_compat) and .cuda()/synchronize made no-ops for CPU.

    The reference's main() seeds torch+numpy but not python `random`
    (which _context_mask draws from — deployed, DataLoader workers seed
    it per-epoch); num_workers=0 here, so seed it explicitly for a
    reproducible run.

    If init_out is given, the freshly-initialized model state_dict is
    saved there as {"model": sd} (misc.save_model layout) BEFORE
    training so the JAX side can start from the identical init.

    Returns {"epochs": [per-epoch global-avg {mim_loss, res_loss,
    mlm_loss, lr}]}.
    """
    import random as pyrandom

    import numpy as np
    import torch
    import torch.nn as nn

    _transformers_compat()
    mod = _import_ref_train(REF_PRE, "ref_pre_train", entry="main_pretrain.py")

    import functools

    from .hf_compat import OldBertSelfAttention

    cf = sys.modules["module.context_fusion"]
    bc = sys.modules["module.bert_config"]
    be = sys.modules["module.bert_encoder"]
    me = sys.modules["module.model_ecamp"]
    real_cross = cf.BertSelfAttention
    real_bconf = be.BertConfig
    cf.BertSelfAttention = OldBertSelfAttention
    be.BertConfig = functools.partial(
        bc.BertConfig, hidden_size=bert_hidden,
        num_hidden_layers=bert_layers, num_attention_heads=bert_heads,
        intermediate_size=bert_intermediate)

    torch.manual_seed(seed)
    np.random.seed(seed)
    pyrandom.seed(seed)

    model = me.ECAMP(
        img_size=224, patch_size=16, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, decoder_embed_dim=decoder_embed_dim,
        decoder_depth=decoder_depth, decoder_num_heads=decoder_num_heads,
        mlp_ratio=4, norm_layer=functools.partial(nn.LayerNorm, eps=1e-6))
    # the reference hardcodes bert_mlp's fan-out to BERT-base 768
    # (model_ecamp.py:99); retie it to the tiny BERT hidden with the
    # same init its _init_weights gave the original (xavier + zero bias)
    model.bert_mlp = nn.Linear(embed_dim, bert_hidden, bias=True)
    model._init_weights(model.bert_mlp)
    if init_out:
        torch.save({"model": model.state_dict()}, init_out)

    dataset = mod.ContextBertDataset(
        data_root, max_caption_length=max_caption_length)
    import torch.utils.data as tud

    gen = torch.Generator()
    gen.manual_seed(seed)
    loader = tud.DataLoader(dataset, batch_size=batch_size, shuffle=True,
                            num_workers=0, drop_last=True, generator=gen,
                            collate_fn=dataset.collate_fn)

    param_groups = mod.optim_factory.add_weight_decay(model, weight_decay)
    optimizer = torch.optim.AdamW(param_groups, lr=lr, betas=(0.9, 0.95))
    scaler = mod.NativeScaler()

    args = Namespace(accum_iter=accum_iter, mask_ratio=mask_ratio, lr=lr,
                     min_lr=min_lr, warmup_epochs=warmup_epochs,
                     max_epoch=max_epoch, epochs=epochs)

    orig_cuda = torch.Tensor.cuda
    orig_sync = torch.cuda.synchronize
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.synchronize = lambda *a, **k: None
    per_epoch = []
    try:
        for epoch in range(epochs):
            stats = mod.train_one_epoch(
                model, loader, optimizer, torch.device("cpu"), epoch,
                scaler, log_writer=None, args=args)
            per_epoch.append({k: float(v) for k, v in stats.items()})
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.cuda.synchronize = orig_sync
        cf.BertSelfAttention = real_cross
        be.BertConfig = real_bconf
    return {"epochs": per_epoch}


def run_reference_visualization(init_out: str, *, image, ids,
                                attention_mask, type_ids,
                                embed_dim: int = 64, depth: int = 2,
                                num_heads: int = 4,
                                decoder_embed_dim: int = 64,
                                decoder_depth: int = 1,
                                decoder_num_heads: int = 4,
                                bert_hidden: int = 64, bert_layers: int = 2,
                                bert_heads: int = 4,
                                bert_intermediate: int = 128,
                                img_size: int = 224, seed: int = 7):
    """Drive the reference Visualization forward in-process on CPU.

    Builds the Visualization flavor of ECAMP (whose context-fusion layer
    returns the raw cross-attention probabilities —
    Visualization/module/context_fusion.py:57, bert_modeling.py:121-129)
    with tiny dims at the real 224/16 grid, saves its fresh init to
    `init_out` as {"model": sd} so the JAX side can import the identical
    weights, and runs main_visualization.py's model call (eval,
    no_grad, default mask_ratio=0 — model_ecamp.py:308-319).

    Quirk handled here: at mask_ratio=0 the reference still routes all
    tokens through random_masking's argsort(rand) shuffle
    (model_ecamp.py:166-191), so the returned key axis is in a random
    patch order. The shuffle's noise is the only RNG draw of the eval
    forward, so it is replayed from the same torch seed to recover
    ids_shuffle, and the probs are returned BOTH in raw key order and
    unshuffled to patch order (key j attends patch ids_shuffle[j]).

    Returns {"probs_key_order", "probs_patch_order", "ids_shuffle"}
    as numpy arrays; probs are (1, H, L_text, grid^2).
    """
    import functools
    import importlib

    import numpy as np
    import torch
    import torch.nn as nn

    _install_stubs()
    _transformers_compat()
    for other in (REF_CLS, REF_SEG, REF_DET, REF_PRE, REF_VIZ):
        while other in sys.path:
            sys.path.remove(other)
    for name in list(sys.modules):
        if name in ("models_vit", "utils", "detector_backbone_vit",
                    "detector_backbone_resnet", "detector_model",
                    "util", "module") or \
                name.startswith(("utils.", "util.", "module.")):
            del sys.modules[name]
    sys.path.insert(0, REF_VIZ)
    me = importlib.import_module("module.model_ecamp")

    from .hf_compat import OldBertSelfAttention

    cf = sys.modules["module.context_fusion"]
    bc = sys.modules["module.bert_config"]
    be = sys.modules["module.bert_encoder"]
    real_cross = cf.BertSelfAttention
    real_bconf = be.BertConfig
    cf.BertSelfAttention = OldBertSelfAttention
    be.BertConfig = functools.partial(
        bc.BertConfig, hidden_size=bert_hidden,
        num_hidden_layers=bert_layers, num_attention_heads=bert_heads,
        intermediate_size=bert_intermediate)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        torch.manual_seed(seed)
        model = me.ECAMP(
            img_size=img_size, patch_size=16, embed_dim=embed_dim,
            depth=depth, num_heads=num_heads,
            decoder_embed_dim=decoder_embed_dim,
            decoder_depth=decoder_depth,
            decoder_num_heads=decoder_num_heads, mlp_ratio=4,
            norm_layer=functools.partial(nn.LayerNorm, eps=1e-6))
        # retie the 768-hardcoded bridge to the tiny BERT hidden
        # (model_ecamp.py:99), same init as the pretrain runner
        model.bert_mlp = nn.Linear(embed_dim, bert_hidden, bias=True)
        model._init_weights(model.bert_mlp)
        torch.save({"model": model.state_dict()}, init_out)
        model.eval()

        L = (img_size // 16) ** 2
        # replay the forward's single RNG draw to recover the shuffle
        torch.manual_seed(seed + 1)
        noise = torch.rand(1, L)
        ids_shuffle = torch.argsort(noise, dim=1)[0].numpy()
        torch.manual_seed(seed + 1)
        with torch.no_grad():
            probs = model(torch.as_tensor(image),
                          torch.as_tensor(ids),
                          torch.as_tensor(attention_mask),
                          torch.as_tensor(type_ids))
        probs = probs.numpy()
        patch_order = np.empty_like(probs)
        patch_order[..., ids_shuffle] = probs
    finally:
        torch.Tensor.cuda = orig_cuda
        cf.BertSelfAttention = real_cross
        be.BertConfig = real_bconf
    return {"probs_key_order": probs, "probs_patch_order": patch_order,
            "ids_shuffle": ids_shuffle}
