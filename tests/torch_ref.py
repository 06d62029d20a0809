"""Load the *reference* PyTorch models for numeric parity testing.

The reference repo (read-only at /root/reference) has broken intra-package
imports (SURVEY.md §0.1) and depends on timm/torchvision which are not
installed.  This helper installs minimal shims and loads the generator
component modules under the logical names the reference imports
(pool/main_branch/nstb/win_partition/win_attention), so we can instantiate
the original torch NGswin / MultiScaleDiscriminator, randomise them, and
check our flax re-implementation produces identical numerics through the
checkpoint importer.

Nothing from the reference is copied — it is imported at test time only, and
tests skip cleanly when /root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import itertools
import os
import sys
import types

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "models"))


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    helpers = types.ModuleType("timm.models.helpers")
    vit = types.ModuleType("timm.models.vision_transformer")
    enb = types.ModuleType("timm.models._efficientnet_builder")
    fx = types.ModuleType("timm.models.fx_features")

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def to_ntuple(n):
        def parse(x):
            if isinstance(x, (tuple, list)):
                return tuple(x)
            return tuple(itertools.repeat(x, n))

        return parse

    def _assert(cond, msg=""):
        assert cond, msg

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return tensor.normal_(mean, std).clamp_(a * std, b * std)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # parity tests run in eval with rate 0

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        return module

    def get_init_weights_vit(mode="", head_bias=0.0):
        return lambda module, name: None

    def _init_weight_goog(m, n="", fix_group_fanout=True):
        return None

    def register_notrace_function(fn):
        return fn

    layers.to_2tuple = to_2tuple
    layers.to_ntuple = to_ntuple
    layers._assert = _assert
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    helpers.named_apply = named_apply
    vit.get_init_weights_vit = get_init_weights_vit
    enb._init_weight_goog = _init_weight_goog
    fx.register_notrace_function = register_notrace_function

    timm.models = models
    models.layers = layers
    models.helpers = helpers
    models.vision_transformer = vit
    models._efficientnet_builder = enb
    models.fx_features = fx
    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.helpers": helpers,
            "timm.models.vision_transformer": vit,
            "timm.models._efficientnet_builder": enb,
            "timm.models.fx_features": fx,
        }
    )


def _install_torchvision_shim():
    if "torchvision" in sys.modules:
        return
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def pad(img, padding, fill=0, padding_mode="constant"):
        # torchvision semantics: padding = [left, top, right, bottom]
        left, top, right, bottom = padding
        return F.pad(img, (left, right, top, bottom), value=fill)

    def normalize(tensor, mean, std, inplace=False):
        raise NotImplementedError("img_norm is always False in the reference")

    functional.pad = pad
    functional.normalize = normalize
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.transforms": transforms,
            "torchvision.transforms.functional": functional,
        }
    )


def _load_as(fullname: str, filepath: str):
    if fullname in sys.modules:
        return sys.modules[fullname]
    spec = importlib.util.spec_from_file_location(fullname, filepath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_generator_module():
    """Return the reference's ngswin module (torch), fixing its broken
    logical-name imports via module aliases (SURVEY.md §0.1 name map)."""
    _install_timm_shim()
    _install_torchvision_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    comp = os.path.join(REFERENCE, "models/generator/components")
    # ensure packages exist
    for pkg in ("models", "models.generator"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REFERENCE, *pkg.split("."))]
            sys.modules[pkg] = m

    # Register each component under the *logical* name the reference imports
    # (SURVEY.md §0.1 name map), all inside models.generator so every broken
    # relative import resolves.
    base = "models.generator"
    _load_as(f"{base}.win_attention", os.path.join(comp, "attention.py"))
    _load_as(f"{base}.win_partition", os.path.join(comp, "window_utils.py"))
    _load_as(f"{base}.nstb", os.path.join(comp, "transformer_blocks.py"))
    _load_as(f"{base}.pool", os.path.join(comp, "pooling.py"))
    _load_as(f"{base}.main_branch", os.path.join(comp, "encoder_decoder.py"))
    _load_as(f"{base}.reconstruction", os.path.join(comp, "reconstruction.py"))
    ngswin = _load_as(
        f"{base}.ngswin_ref", os.path.join(REFERENCE, "models/generator/ngswin.py")
    )
    return ngswin


def load_reference_discriminator_module():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return _load_as(
        "models.discriminator.ms_patchgan_ref",
        os.path.join(REFERENCE, "models/discriminator/ms_patchgan.py"),
    )
