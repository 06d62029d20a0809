from tmar.checkpoint.torch_import import (
    import_ngswin_state_dict,
    import_discriminator_state_dict,
    load_torch_checkpoint,
)
from tmar.checkpoint.torch_export import export_ngswin_state_dict, save_pth

__all__ = [
    "import_ngswin_state_dict",
    "import_discriminator_state_dict",
    "load_torch_checkpoint",
    "export_ngswin_state_dict",
    "save_pth",
]
