from tmar.checkpoint.torch_import import (
    import_ngswin_state_dict,
    import_discriminator_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "import_ngswin_state_dict",
    "import_discriminator_state_dict",
    "load_torch_checkpoint",
]
