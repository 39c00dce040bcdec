"""exprgrad-tpu: a TPU-native differentiable array programming language.

A ground-up rebuild of the capabilities of can-lehmann/exprgrad for TPUs:
einsum-style kernels with compiler-derived gradients (IR-level symbolic
autodiff), shape/loop-bound inference, and an XLA/Pallas backend that maps
contractions onto the MXU and elementwise work onto the VPU.

Quick start::

    from exprgrad_tpu import Fun, input, param, iters, compile

    y, x, it = iters("y", "x", "it")
    hidden = Fun("hidden")
    hidden[y, x] = input("x")[y, it] * param([2, 4])[it, x]
    model = compile(hidden.target("predict"))
    model.call("predict", {"x": data})
"""

from .errors import (
    ExprgradError,
    GradientError,
    GeneratorError,
    KernelTypeError,
    ModelRuntimeError,
    ParserError,
    RematWarning,
    ScheduleWarning,
    ShapeError,
    StageError,
    ValidationError,
)
from .expr import (
    Boolean,
    Index,
    Scalar,
    array,
    cos,
    debug_index,
    debug_scalar,
    epoch,
    exp,
    irange,
    iters,
    ln,
    log,
    log2,
    log10,
    maximum,
    minimum,
    pow_,
    select,
    sin,
    sq,
    sqrt,
    to_index,
    to_scalar,
    wrap,
)
from .fun import (
    Fun,
    cache,
    cond,
    extern,
    extern_grads,
    grad,
    input,
    input_,
    layer,
    make_opt,
    param,
    rand,
    to_program,
)
from .registry import register_extern
from .model import Model, compile, load_compiled
from .quant import QuantW, dequantize, quantize_weight
from .train import classification_accuracy, evaluate, train
from .autotune import TuneReport
from .tensor import (
    Tensor,
    concat_first,
    one_hot,
    remap,
    select_random_samples,
    select_samples,
    shuffle_xy,
    squares,
    view_first,
)

__version__ = "0.1.0"

__all__ = [
    "Boolean", "Index", "Scalar", "Fun", "Model", "Tensor", "TuneReport",
    "array", "cache", "compile", "cond", "cos", "epoch", "exp",
    "extern", "extern_grads", "grad", "register_extern",
    "debug_index", "debug_scalar",
    "input", "input_", "irange", "iters", "layer", "ln", "load_compiled",
    "log", "log10",
    "log2", "make_opt", "maximum", "minimum", "one_hot", "param", "pow_",
    "rand", "remap", "select", "sin", "sq", "sqrt", "to_index", "to_program",
    "to_scalar", "wrap",
    "ExprgradError", "GradientError", "GeneratorError", "KernelTypeError",
    "ModelRuntimeError", "ParserError", "RematWarning", "ScheduleWarning",
    "ShapeError",
    "StageError",
    "ValidationError",
]
