"""Run a named recipe preset (ecamp_tpu.core.presets mirrors every
reference run.sh recipe).

    python -m ecamp_tpu.cli.run_preset cls_ft_ChestX-ray14_100 \
        --dataset_path /data/cxr14 --pretrained ecamp.pth

Preset args come first; extra CLI args append/override.
"""

from __future__ import annotations

import sys

from ..core.presets import PRESETS, list_presets, preset_argv


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "list"):
        print("available presets:")
        for name in list_presets():
            print(f"  {name}  ->  {PRESETS[name]['entry']}")
        return
    name = sys.argv[1]
    if name not in PRESETS:
        raise SystemExit(f"unknown preset {name!r}; run with 'list'")
    entry = PRESETS[name]["entry"]
    argv = [entry] + preset_argv(name) + sys.argv[2:]
    sys.argv = argv
    if entry == "pretrain":
        from . import pretrain as mod
    elif entry == "finetune_cls":
        from . import finetune_cls as mod
    elif entry == "finetune_seg":
        from . import finetune_seg as mod
    elif entry == "finetune_det":
        from . import finetune_det as mod
    else:
        raise SystemExit(f"unknown entry {entry}")
    mod.main()


if __name__ == "__main__":
    main()
