"""Pytree-aware array slicing/splitting utilities.

TPU-native counterpart of the reference's ``torch_cfd/tensor_utils.py``
(slice_along_axis: tensor_utils.py:34, split_along_axis: :66, split_axis: :88).
Here the functions operate on arbitrary JAX pytrees via ``jax.tree_util`` and
are jit/vmap-safe for static slice arguments.
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp

PyTree = Any


def _is_leaf_array(x) -> bool:
    return isinstance(x, (jnp.ndarray, jax.Array))


def slice_along_axis(
    inputs: PyTree,
    axis: int,
    idx: Union[slice, int],
    expect_same_dims: bool = True,
) -> PyTree:
    """Slices all array leaves of ``inputs`` along ``axis`` with ``idx``.

    Args:
      inputs: pytree of arrays to slice.
      axis: axis along which to slice (may be negative).
      idx: a ``slice`` or an integer index (integer drops the axis).
      expect_same_dims: if True, requires all leaves to have the same ndim.

    Returns:
      Pytree with each array leaf sliced.
    """
    leaves, treedef = jax.tree_util.tree_flatten(inputs)
    ndims = {leaf.ndim for leaf in leaves}
    if expect_same_dims and len(ndims) != 1:
        raise ValueError(
            "arrays in `inputs` expected to have same ndims, but have "
            f"{ndims}. To allow this, pass expect_same_dims=False"
        )
    sliced = []
    for leaf in leaves:
        ndim = leaf.ndim
        index = tuple(
            idx if k == axis % ndim else slice(None) for k in range(ndim)
        )
        sliced.append(leaf[index])
    return jax.tree_util.tree_unflatten(treedef, sliced)


def split_along_axis(
    inputs: PyTree,
    split_idx: int,
    axis: int,
    expect_same_dims: bool = True,
) -> Tuple[PyTree, PyTree]:
    """Splits all leaves into two at ``split_idx`` along ``axis``."""
    first = slice_along_axis(inputs, axis, slice(0, split_idx), expect_same_dims)
    second = slice_along_axis(inputs, axis, slice(split_idx, None), expect_same_dims)
    return first, second


def split_axis(
    inputs: PyTree,
    axis: int,
    keep_dims: bool = False,
) -> Tuple[PyTree, ...]:
    """Splits the leaves of ``inputs`` along ``axis`` into unit slices.

    Args:
      inputs: pytree of arrays, all with equal size along ``axis``.
      axis: axis to split along.
      keep_dims: if False the split axis is squeezed away in each output.

    Returns:
      Tuple of pytrees, one per index along ``axis``.
    """
    leaves, _ = jax.tree_util.tree_flatten(inputs)
    if not leaves:
        raise ValueError("inputs has no array leaves")
    axis_shapes = {leaf.shape[axis] for leaf in leaves}
    if len(axis_shapes) != 1:
        raise ValueError(f"arrays must have equal sized axis but got {axis_shapes}")
    (axis_shape,) = axis_shapes
    outputs = []
    for i in range(axis_shape):
        index = i if not keep_dims else slice(i, i + 1)
        outputs.append(slice_along_axis(inputs, axis, index))
    return tuple(outputs)
