"""In-place driving of the REFERENCE trainers on CPU for end-to-end
training parity (VERDICT r2 #1).

The reference imports timm 0.4.12, apex, torchvision, and ipdb — none of
which exist in this image. This package supplies minimal stand-ins:

- timm_stub: a torch VisionTransformer with timm-0.4.12 forward semantics
  (fused qkv, pre-LN blocks, DropPath stochastic depth, trunc-normal
  inits) — re-written from the published architecture, NOT copied; only
  what models_vit.py subclasses/uses.
- tv_stub: torchvision.transforms equivalents over PIL images
  (RandomResizedCrop/Flip/Grayscale/ToTensor/Normalize/Resize/CenterCrop).
- apex/ipdb: import-satisfying no-ops (the CPU path never calls amp —
  train.py only uses apex under args.fp16).

driver.run_reference_cls() injects these into sys.modules, imports the
reference's own Classification/train.py, and runs its setup()/train()/
test() functions unmodified.
"""
