"""Run the reference's Classification/train.py functions in-process on
CPU (VERDICT r2 #1: end-to-end training parity evidence).

The reference code itself is imported from /root/reference and executed
unmodified; only its missing third-party imports are satisfied by stubs
(timm_stub / tv_stub / apex / ipdb) and DataLoader workers are forced to
0 for this 1-core box (math-neutral)."""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from argparse import Namespace

REF_CLS = "/root/reference/ECAMP/Fine-tuning/Classification"
REF_SEG = "/root/reference/ECAMP/Fine-tuning/Segmentation"
REF_DET = "/root/reference/ECAMP/Fine-tuning/Detection"


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


def _import_ref_train(ref_dir: str = REF_CLS, modname: str = "ref_cls_train"):
    """Import <ref_dir>/train.py as `modname`. The Classification and
    Segmentation dirs both define top-level `models_vit` and `utils.*`
    modules, so any previously-imported copies are purged and sys.path is
    re-ordered before loading."""
    _install_stubs()
    for other in (REF_CLS, REF_SEG, REF_DET):
        while other in sys.path:
            sys.path.remove(other)
    for name in list(sys.modules):
        if name in ("models_vit", "utils", "detector_backbone_vit",
                    "detector_backbone_resnet", "detector_model") or \
                name.startswith("utils."):
            del sys.modules[name]
    sys.path.insert(0, ref_dir)
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(ref_dir, "train.py"))
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
