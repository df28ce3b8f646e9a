from .torch_import import (
    load_pth,
    import_ecamp_pretrain,
    import_vit_classifier,
    import_seg_vit,
    import_detector,
    import_resnet_unet,
)
from .orbax_io import save_checkpoint, restore_checkpoint, latest_step
from .torch_export import (
    export_detector,
    export_ecamp_pretrain,
    export_seg_vit,
    export_vit_classifier,
    write_pth,
)
