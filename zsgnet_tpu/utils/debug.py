"""Dev-mode numerical checks — checkify-based (SURVEY.md §5 "sanitizers").

The reference has no sanitizers; the jit-pure equivalent here is
``jax.experimental.checkify``: wrap a jitted step to trap NaN/Inf and
out-of-bounds indexing *inside* the compiled program, surfacing them as
host-side errors instead of silent garbage. Opt-in (costs a few percent),
meant for debugging diverging runs:

    step = checked(make_train_step(cfg, anchors, mesh))
    state, ls = step(state, batch)   # raises on NaN with location info
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable[..., Any], errors=None) -> Callable[..., Any]:
    """Wrap a (jittable) function with NaN/OOB/div-by-zero checking."""
    errors = errors if errors is not None else checkify.all_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args: Any, **kwargs: Any) -> Any:
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Host-side finiteness assertion over a pytree (eager debugging)."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
