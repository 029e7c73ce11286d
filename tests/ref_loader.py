"""Helpers to import reference torch modules (read-only) for parity tests.

The reference StyleGAN2 `model.py` JIT-compiles CUDA extensions at import,
which is impossible here; we inject a minimal torch EqualLinear stub under
its module name so `psp_encoders.py` (pure torch otherwise) can load.

For *full-generator* parity we go further: `install_op_stub()` registers a
pure-CPU `libs.gan.StyleGAN2.op` module whose `upfirdn2d` routes to the
reference's own CPU oracle `upfirdn2d_native` (extracted via AST from
`op/upfirdn2d.py:168-209` so its CUDA-extension import never runs) and whose
`FusedLeakyReLU`/`fused_leaky_relu` implement the documented kernel
semantics (`op/fused_act.py:73-86`: ``leaky_relu(x + b[c], 0.2) * sqrt(2)``).
With that stub in place the REAL reference `model.py` imports and runs on
CPU. Nothing from the reference is copied — modules are executed in place.
"""

import ast
import math
import sys
import types
from collections import abc

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


def _extract_upfirdn2d_native():
    """Execute ONLY the `upfirdn2d_native` def from the reference's
    `op/upfirdn2d.py` (its module-level CUDA-extension load cannot run here).
    This is the reference's own CPU oracle (`upfirdn2d.py:168-209`)."""
    path = f"{REF_ROOT}/libs/gan/StyleGAN2/op/upfirdn2d.py"
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "upfirdn2d_native")
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"torch": torch, "F": F, "abc": abc}
    exec(compile(mod, path, "exec"), ns)
    return ns["upfirdn2d_native"]


def _fused_leaky_relu_cpu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
    """CPU semantics of the fused CUDA kernel (`op/fused_act.py:73-86`,
    bias broadcast along channel dim 1 per `fused_bias_act_kernel.cu:28-30`)."""
    shape = [1, bias.shape[0]] + [1] * (input.ndim - 2)
    return F.leaky_relu(input + bias.view(*shape), negative_slope) * scale


class _FusedLeakyReLUCPU(nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, input):
        return _fused_leaky_relu_cpu(input, self.bias, self.negative_slope,
                                     self.scale)


def install_op_stub():
    """Register a pure-CPU `libs.gan.StyleGAN2.op` so the real reference
    `model.py` (which does `from .op import ...`, `model.py:8`) can import.

    If ANOTHER test already installed a non-functional op module (e.g. a
    schema-only stub whose functions return None), replace it and drop the
    model module so it re-imports against the functional stub — otherwise
    the real Generator's forward silently threads None through
    `fused_leaky_relu` (this bit in full-suite ordering once)."""
    install_reference_path()
    name = "libs.gan.StyleGAN2.op"
    existing = sys.modules.get(name)
    if existing is not None:
        if getattr(existing, "_functional_cpu_stub", False):
            return existing
        sys.modules.pop(name, None)
        sys.modules.pop("libs.gan.StyleGAN2.model", None)
    native = _extract_upfirdn2d_native()

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        # argument normalization mirrors the reference wrapper
        # (`op/upfirdn2d.py:149-165`)
        if not isinstance(up, abc.Iterable):
            up = (up, up)
        if not isinstance(down, abc.Iterable):
            down = (down, down)
        if len(pad) == 2:
            pad = (pad[0], pad[1], pad[0], pad[1])
        return native(input, kernel, up[0], up[1], down[0], down[1],
                      pad[0], pad[1], pad[2], pad[3])

    stub = types.ModuleType(name)
    stub.upfirdn2d = upfirdn2d
    stub.fused_leaky_relu = _fused_leaky_relu_cpu
    stub.FusedLeakyReLU = _FusedLeakyReLUCPU
    stub._functional_cpu_stub = True
    sys.modules[name] = stub
    return stub


def load_generator_module():
    """Import the REAL reference `libs.gan.StyleGAN2.model` on CPU.

    The e4e path installs an `_EqualLinearStub` under this module name
    (`install_reference_path`); replace it with the genuine module, which is
    a strict superset (its `EqualLinear` matches the stub semantics)."""
    import importlib
    install_op_stub()
    name = "libs.gan.StyleGAN2.model"
    mod = sys.modules.get(name)
    if mod is not None and getattr(mod, "Generator", None) is not None:
        return mod
    sys.modules.pop(name, None)
    mod = importlib.import_module(name)
    return mod


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


def extract_ref_function(relpath, name, class_name=None, namespace=None):
    """Execute ONE function (or method) definition from a reference file
    without importing the module (whose top-level imports may need CUDA,
    torchvision, wandb, ...). Same technique as `_extract_upfirdn2d_native`.

    ``class_name``: pull the def out of that class body; the result is the
    plain function — call it with an explicit ``self`` (e.g. a
    SimpleNamespace carrying the attributes the method reads).
    ``namespace``: extra globals the function body needs.
    """
    path = f"{REF_ROOT}/{relpath}"
    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    body = tree.body
    if class_name is not None:
        cls = next(n for n in body if isinstance(n, ast.ClassDef)
                   and n.name == class_name)
        body = cls.body
    fn = next(n for n in body if isinstance(n, ast.FunctionDef)
              and n.name == name)
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"torch": torch, "F": F}
    if namespace:
        ns.update(namespace)
    exec(compile(mod, path, "exec"), ns)
    return ns[name]


class cuda_noop:
    """Context manager: make `.cuda()` a no-op so reference code with
    hard-coded device placement (`run_inference.py:31` etc.) runs on CPU."""

    def __enter__(self):
        self._orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        return self

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._orig
        return False
