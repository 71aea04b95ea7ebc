from .node import (
    Expr,
    as_expr,
    cast,
    constant,
    element_index,
    if_else,
    make_temp,
    tag,
)
from .compile import eval_expr, evaluate, evaluate_multi
from .builtins import BUILTINS, builtin
from .function import Function, device_function, function
from .view import (
    MultiSliceView,
    PermutationView,
    ReshapeView,
    SliceTerminal,
    permutation,
    r,
    range_,
    reduce_view,
    reshape,
    slicer,
    _,
)
