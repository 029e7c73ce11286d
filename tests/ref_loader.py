"""Helpers to import reference torch modules (read-only) for parity tests.

The reference StyleGAN2 `model.py` JIT-compiles CUDA extensions at import,
which is impossible here; we inject a minimal torch EqualLinear stub under
its module name so `psp_encoders.py` (pure torch otherwise) can load.
Nothing from the reference is copied — modules are executed in place.
"""

import math
import sys
import types

import torch
from torch import nn
from torch.nn import functional as F

REF_ROOT = "/root/reference"


class _EqualLinearStub(nn.Module):
    """Matches the reference EqualLinear semantics (model.py:129-162) for the
    no-activation path used by GradualStyleBlock."""

    def __init__(self, in_dim, out_dim, bias=True, bias_init=0, lr_mul=1,
                 activation=None):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim).div_(lr_mul))
        self.bias = nn.Parameter(torch.zeros(out_dim).fill_(bias_init)) if bias else None
        self.activation = activation
        self.scale = (1 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul

    def forward(self, x):
        assert self.activation is None
        return F.linear(x, self.weight * self.scale,
                        bias=self.bias * self.lr_mul if self.bias is not None else None)


def install_reference_path():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    name = "libs.gan.StyleGAN2.model"
    if name not in sys.modules:
        stub = types.ModuleType(name)
        stub.EqualLinear = _EqualLinearStub
        sys.modules[name] = stub


def load_e4e_class():
    install_reference_path()
    from libs.gan.encoder4editing.psp_encoders import Encoder4Editing
    return Encoder4Editing


def load_helpers():
    install_reference_path()
    from libs.gan.encoder4editing import helpers
    return helpers


def load_backbone_class():
    install_reference_path()
    from libs.criteria.model_irse import Backbone
    return Backbone


def state_dict_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
