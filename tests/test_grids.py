"""Tests for the grid data model (mirrors reference torch_cfd/tests/test_grids.py).

Covers: GridArray arithmetic/offset enforcement, pytree/jit/vmap interop (the
TPU-native replacement for the reference's ``__torch_function__`` tests),
consistency helpers, GridVariable algebra incl. BC mismatch errors, vector
containers, and periodic/Dirichlet/Neumann shift-pad-trim semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_cfd import boundaries, grids
from tpu_cfd.boundaries import BCType


def periodic_grid_variable(data, offset, grid):
    return grids.GridVariable(
        grids.GridArray(data, offset, grid),
        boundaries.periodic_boundary_conditions(grid.ndim),
    )


class TestGrid:
    def test_constructor_and_attributes(self):
        with pytest.raises(TypeError):
            grids.Grid((10,), step=0.1, domain=((0, 1),))
        grid = grids.Grid((10, 10), step=0.1)
        assert grid.shape == (10, 10)
        assert grid.step == (0.1, 0.1)
        np.testing.assert_allclose(grid.domain, ((0.0, 1.0), (0.0, 1.0)))
        assert grid.ndim == 2
        assert grid.cell_center == (0.5, 0.5)
        assert grid.cell_faces == ((1.0, 0.5), (0.5, 1.0))

    def test_constructor_from_domain(self):
        grid = grids.Grid((10,), domain=((-2.0, 2.0),))
        assert grid.step == (0.4,)
        grid2 = grids.Grid((4, 4), domain=2 * jnp.pi)
        np.testing.assert_allclose(grid2.step, (jnp.pi / 2, jnp.pi / 2))

    def test_grid_hashable_static(self):
        g1 = grids.Grid((8, 8), domain=((0, 1), (0, 1)))
        g2 = grids.Grid((8, 8), domain=((0, 1), (0, 1)))
        assert g1 == g2
        assert hash(g1) == hash(g2)
        assert len({g1, g2}) == 1

    def test_axes_and_mesh(self):
        grid = grids.Grid((4,), domain=((0.0, 1.0),))
        (axis,) = grid.axes()
        np.testing.assert_allclose(axis, [0.125, 0.375, 0.625, 0.875])
        (axis,) = grid.axes(offset=(0.0,))
        np.testing.assert_allclose(axis, [0.0, 0.25, 0.5, 0.75])
        grid2 = grids.Grid((4, 6), domain=((0, 4.0), (0, 6.0)))
        x, y = grid2.mesh()
        assert x.shape == y.shape == (4, 6)
        np.testing.assert_allclose(x[:, 0], [0.5, 1.5, 2.5, 3.5])

    def test_fft_and_rfft_mesh(self):
        grid = grids.Grid((8, 8), domain=((0, 2 * np.pi), (0, 2 * np.pi)))
        kx, ky = grid.fft_mesh()
        assert kx.shape == (8, 8)
        krx, kry = grid.rfft_mesh()
        assert krx.shape == (8, 5)
        # ordinal frequencies: multiply by 2*pi to get angular wavenumbers
        np.testing.assert_allclose(
            2 * np.pi * np.asarray(kx[:, 0]),
            np.fft.fftfreq(8, d=2 * np.pi / 8) * 2 * np.pi,
            rtol=1e-6,
        )

    def test_eval_on_mesh(self):
        grid = grids.Grid((4,), domain=((0.0, 1.0),))
        u = grid.eval_on_mesh(lambda x: 2 * x, offset=(0.0,))
        np.testing.assert_allclose(u.data, [0.0, 0.5, 1.0, 1.5])
        assert u.offset == (0.0,)

    def test_stagger(self):
        grid = grids.Grid((4, 4))
        u, v = grid.stagger((jnp.zeros((4, 4)), jnp.zeros((4, 4))))
        assert u.offset == (1.0, 0.5)
        assert v.offset == (0.5, 1.0)


class TestGridArray:
    def test_arithmetic_matching_offsets(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid)
        b = grids.GridArray(2 * jnp.ones((4, 4)), (0.5, 0.5), grid)
        np.testing.assert_allclose((a + b).data, 3.0)
        np.testing.assert_allclose((a - b).data, -1.0)
        np.testing.assert_allclose((a * b).data, 2.0)
        np.testing.assert_allclose((a / b).data, 0.5)
        np.testing.assert_allclose((a**2).data, 1.0)
        np.testing.assert_allclose((-a).data, -1.0)
        np.testing.assert_allclose((3.0 * a).data, 3.0)
        np.testing.assert_allclose((3.0 - a).data, 2.0)
        assert (a + b).offset == (0.5, 0.5)

    def test_arithmetic_offset_mismatch_raises(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid)
        b = grids.GridArray(jnp.ones((4, 4)), (1.0, 0.5), grid)
        with pytest.raises(ValueError, match="offsets do not match"):
            _ = a + b

    def test_arithmetic_grid_mismatch_raises(self):
        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grids.Grid((4, 4)))
        b = grids.GridArray(
            jnp.ones((4, 4)), (0.5, 0.5), grids.Grid((4, 4), domain=((0, 2), (0, 2)))
        )
        with pytest.raises(ValueError, match="grids do not match"):
            _ = a + b

    def test_pytree_roundtrip(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.arange(16.0).reshape(4, 4), (0.5, 0.5), grid)
        leaves, treedef = jax.tree_util.tree_flatten(a)
        assert len(leaves) == 1
        b = jax.tree_util.tree_unflatten(treedef, leaves)
        assert b.offset == a.offset and b.grid == a.grid
        np.testing.assert_array_equal(b.data, a.data)

    def test_jit_and_vmap(self):
        grid = grids.Grid((4, 4))

        @jax.jit
        def double(u: grids.GridArray) -> grids.GridArray:
            return u + u

        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid)
        out = double(a)
        assert isinstance(out, grids.GridArray)
        np.testing.assert_allclose(out.data, 2.0)

        batched = grids.GridArray(jnp.ones((3, 4, 4)), (0.5, 0.5), grid)
        out = jax.vmap(double)(batched)
        assert out.data.shape == (3, 4, 4)

    def test_applied(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(-jnp.ones((4, 4)), (0.5, 0.5), grid)
        out = grids.applied(jnp.abs)(a)
        np.testing.assert_allclose(out.data, 1.0)
        assert out.offset == a.offset

    def test_applied_offset_mismatch_raises(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid)
        b = grids.GridArray(jnp.ones((4, 4)), (1.0, 1.0), grid)
        with pytest.raises(ValueError, match="unique offset"):
            grids.applied(jnp.add)(a, b)

    def test_where(self):
        grid = grids.Grid((4,))
        a = grids.GridArray(jnp.array([1.0, -1.0, 2.0, -2.0]), (0.5,), grid)
        out = grids.where(a, a, 0.0)
        assert out.offset == (0.5,)

    def test_fft_interop_via_data(self):
        # TPU-native replacement for __torch_function__ interop: lift with applied
        grid = grids.Grid((8,), domain=((0, 2 * np.pi),))
        u = grid.eval_on_mesh(jnp.sin)
        u_hat = grids.applied(jnp.fft.fft)(u)
        assert u_hat.data.dtype in (jnp.complex64, jnp.complex128)
        assert u_hat.offset == u.offset


class TestConsistencyHelpers:
    def test_averaged_offset(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.zeros((4, 4)), (0.0, 0.5), grid)
        b = grids.GridArray(jnp.zeros((4, 4)), (1.0, 0.5), grid)
        assert grids.averaged_offset_arrays(a, b) == (0.5, 0.5)

    def test_control_volume_offsets(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.zeros((4, 4)), (0.0, 0.0), grid)
        assert grids.control_volume_offsets(a) == ((0.5, 0.0), (0.0, 0.5))

    def test_consistent_offset(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid)
        b = grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid)
        assert grids.consistent_offset_arrays(a, b) == (0.5, 0.5)
        c = grids.GridArray(jnp.zeros((4, 4)), (1.0, 0.5), grid)
        with pytest.raises(ValueError):
            grids.consistent_offset_arrays(a, c)

    def test_consistent_grid(self):
        g = grids.Grid((4, 4))
        a = grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), g)
        assert grids.consistent_grid_arrays(a, a) == g
        b = grids.GridArray(jnp.zeros((8, 8)), (0.5, 0.5), grids.Grid((8, 8)))
        with pytest.raises(ValueError):
            grids.consistent_grid_arrays(a, b)


class TestGridVariable:
    def test_constructor_checks(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        array = grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid)
        v = grids.GridVariable(array, bc)
        assert v.offset == (0.5, 0.5) and v.grid == grid
        with pytest.raises(ValueError):
            grids.GridVariable(array, boundaries.periodic_boundary_conditions(1))

    def test_arithmetic_same_bc(self):
        grid = grids.Grid((4, 4))
        u = periodic_grid_variable(jnp.ones((4, 4)), (0.5, 0.5), grid)
        v = periodic_grid_variable(2 * jnp.ones((4, 4)), (0.5, 0.5), grid)
        np.testing.assert_allclose((u + v).data, 3.0)
        np.testing.assert_allclose((u * v).data, 2.0)
        assert isinstance(u + v, grids.GridVariable)

    def test_arithmetic_bc_mismatch_raises(self):
        grid = grids.Grid((4, 4))
        u = periodic_grid_variable(jnp.ones((4, 4)), (0.5, 0.5), grid)
        bc2 = boundaries.dirichlet_boundary_conditions(2)
        v = grids.GridVariable(grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid), bc2)
        with pytest.raises(ValueError, match="boundary conditions do not match"):
            _ = u + v

    def test_jit_scan_compatible(self):
        grid = grids.Grid((8, 8))
        u = periodic_grid_variable(jnp.ones((8, 8)), (0.5, 0.5), grid)

        def step(carry, _):
            return carry + 1.0, carry.data.sum()

        final, sums = jax.lax.scan(step, u, None, length=3)
        assert isinstance(final, grids.GridVariable)
        np.testing.assert_allclose(final.data, 4.0)
        assert sums.shape == (3,)

    def test_periodic_shift(self):
        grid = grids.Grid((4,))
        u = periodic_grid_variable(jnp.array([1.0, 2.0, 3.0, 4.0]), (0.5,), grid)
        shifted = u.shift(1, 0)
        np.testing.assert_allclose(shifted.data, [2.0, 3.0, 4.0, 1.0])
        assert shifted.offset == (1.5,)
        shifted = u.shift(-1, 0)
        np.testing.assert_allclose(shifted.data, [4.0, 1.0, 2.0, 3.0])
        assert shifted.offset == (-0.5,)

    def test_interior_periodic_unchanged(self):
        grid = grids.Grid((4, 4))
        u = periodic_grid_variable(jnp.ones((4, 4)), (0.5, 0.5), grid)
        assert u.interior().data.shape == (4, 4)


class TestBoundaryPadding:
    def test_periodic_pad(self):
        grid = grids.Grid((4,))
        bc = boundaries.periodic_boundary_conditions(1)
        u = grids.GridArray(jnp.array([1.0, 2.0, 3.0, 4.0]), (0.5,), grid)
        padded = bc._pad(u, 2, 0)
        np.testing.assert_allclose(padded.data, [1, 2, 3, 4, 1, 2])
        padded = bc._pad(u, -1, 0)
        np.testing.assert_allclose(padded.data, [4, 1, 2, 3, 4])
        assert padded.offset == (-0.5,)

    def test_dirichlet_cell_center_pad(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1, ((1.0, 3.0),))
        u = grids.GridArray(jnp.array([2.0, 4.0, 6.0, 8.0]), (0.5,), grid)
        padded = bc._pad(u, -1, 0)
        # ghost = 2*bc - first interior = 2*1 - 2 = 0
        np.testing.assert_allclose(padded.data, [0.0, 2.0, 4.0, 6.0, 8.0])
        padded = bc._pad(u, 1, 0)
        # ghost = 2*3 - 8 = -2
        np.testing.assert_allclose(padded.data, [2.0, 4.0, 6.0, 8.0, -2.0])

    def test_dirichlet_edge_pad(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1, ((1.0, 3.0),))
        u = grids.GridArray(jnp.array([2.0, 4.0, 6.0, 8.0]), (0.0,), grid)
        padded = bc._pad(u, -1, 0)
        np.testing.assert_allclose(padded.data, [1.0, 2.0, 4.0, 6.0, 8.0])

    def test_neumann_pad(self):
        grid = grids.Grid((4,), step=0.5)
        bc = boundaries.neumann_boundary_conditions(1, ((2.0, 2.0),))
        u = grids.GridArray(jnp.array([1.0, 2.0, 3.0, 4.0]), (0.5,), grid)
        padded = bc._pad(u, -1, 0)
        # ghost = edge - step*value = 1 - 0.5*2 = 0
        np.testing.assert_allclose(padded.data, [0.0, 1.0, 2.0, 3.0, 4.0])
        padded = bc._pad(u, 1, 0)
        np.testing.assert_allclose(padded.data, [1.0, 2.0, 3.0, 4.0, 3.0])

    def test_nonperiodic_multi_ghost_raises(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1)
        u = grids.GridArray(jnp.ones((4,)), (0.5,), grid)
        with pytest.raises(ValueError, match="Padding past 1 ghost cell"):
            bc._pad(u, 2, 0)

    def test_trim(self):
        grid = grids.Grid((4,))
        bc = boundaries.periodic_boundary_conditions(1)
        u = grids.GridArray(jnp.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0]), (-0.5,), grid)
        trimmed = bc._trim(u, -1, 0)
        np.testing.assert_allclose(trimmed.data, [1, 2, 3, 4, 5])
        assert trimmed.offset == (0.5,)

    def test_shift_pad_trim_consistency_dirichlet(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1, ((1.0, 3.0),))
        u = grids.GridVariable(
            grids.GridArray(jnp.array([2.0, 4.0, 6.0, 8.0]), (0.5,), grid), bc
        )
        shifted = u.shift(-1, 0)
        np.testing.assert_allclose(shifted.data, [0.0, 2.0, 4.0, 6.0])
        assert shifted.offset == (-0.5,)

    def test_batched_shift(self):
        grid = grids.Grid((4,))
        bc = boundaries.periodic_boundary_conditions(1)
        data = jnp.stack([jnp.arange(4.0), jnp.arange(4.0) + 10])
        u = grids.GridArray(data, (0.5,), grid)
        shifted = bc.shift(u, 1, 0)
        np.testing.assert_allclose(shifted.data[0], [1, 2, 3, 0])
        np.testing.assert_allclose(shifted.data[1], [11, 12, 13, 10])

    def test_impose_bc_dirichlet_edge(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1, ((1.0, 3.0),))
        u = grids.GridArray(jnp.array([9.0, 2.0, 4.0, 6.0, 9.0]), (0.0,), grid)
        v = bc.impose_bc(u)
        # boundary-coincident points are trimmed, then the lower boundary
        # value is restored (offset-0 data carries n points: upper boundary
        # point only exists at offset 1).
        np.testing.assert_allclose(v.data, [1.0, 2.0, 4.0, 6.0])
        assert v.offset == (0.0,)

    def test_impose_bc_dirichlet_edge_offset_one(self):
        grid = grids.Grid((4,))
        bc = boundaries.dirichlet_boundary_conditions(1, ((1.0, 3.0),))
        u = grids.GridArray(jnp.array([2.0, 4.0, 6.0, 9.0]), (1.0,), grid)
        v = bc.impose_bc(u)
        np.testing.assert_allclose(v.data, [2.0, 4.0, 6.0, 3.0])
        assert v.offset == (1.0,)


class TestVectors:
    def test_grid_array_vector_algebra(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.ones((4, 4)), (1.0, 0.5), grid)
        b = grids.GridArray(jnp.ones((4, 4)), (0.5, 1.0), grid)
        v = grids.GridArrayVector([a, b])
        w = v + v
        assert isinstance(w, grids.GridArrayVector)
        np.testing.assert_allclose(w[0].data, 2.0)
        w = 2.0 * v
        np.testing.assert_allclose(w[1].data, 2.0)
        w = v * v
        np.testing.assert_allclose(w[0].data, 1.0)
        w = -v
        np.testing.assert_allclose(w[0].data, -1.0)

    def test_grid_variable_vector_algebra(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        u = grids.GridVariable(grids.GridArray(jnp.ones((4, 4)), (1.0, 0.5), grid), bc)
        w = grids.GridVariable(grids.GridArray(jnp.ones((4, 4)), (0.5, 1.0), grid), bc)
        v = grids.GridVariableVector([u, w])
        out = v + v - v
        assert isinstance(out, grids.GridVariableVector)
        np.testing.assert_allclose(out[0].data, 1.0)
        assert isinstance(out.arrays, grids.GridArrayVector)

    def test_vector_type_check(self):
        with pytest.raises(TypeError):
            grids.GridArrayVector([jnp.ones((4, 4))])
        with pytest.raises(TypeError):
            grids.GridVariableVector([jnp.ones((4, 4))])

    def test_vector_length_mismatch(self):
        grid = grids.Grid((4, 4))
        a = grids.GridArray(jnp.ones((4, 4)), (0.5, 0.5), grid)
        v1 = grids.GridArrayVector([a])
        v2 = grids.GridArrayVector([a, a])
        with pytest.raises(ValueError):
            _ = v1 + v2

    def test_vector_pytree(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        u = grids.GridVariable(grids.GridArray(jnp.ones((4, 4)), (1.0, 0.5), grid), bc)
        v = grids.GridVariableVector([u, u])
        out = jax.jit(lambda x: x + x)(v)
        assert isinstance(out, grids.GridVariableVector)
        np.testing.assert_allclose(out[0].data, 2.0)


class TestBCInference:
    def test_pressure_bc_from_velocity(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        v = grids.GridVariableVector(
            [
                grids.GridVariable(grids.GridArray(jnp.zeros((4, 4)), (1.0, 0.5), grid), bc),
                grids.GridVariable(grids.GridArray(jnp.zeros((4, 4)), (0.5, 1.0), grid), bc),
            ]
        )
        pbc = boundaries.get_pressure_bc_from_velocity(v)
        assert pbc.types == ((BCType.PERIODIC, BCType.PERIODIC),) * 2

    def test_has_all_periodic(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        u = grids.GridVariable(grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid), bc)
        assert boundaries.has_all_periodic_boundary_conditions(u)
        d = grids.GridVariable(
            grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid),
            boundaries.dirichlet_boundary_conditions(2),
        )
        assert not boundaries.has_all_periodic_boundary_conditions(u, d)

    def test_advection_flux_bc_periodic(self):
        grid = grids.Grid((4, 4))
        bc = boundaries.periodic_boundary_conditions(2)
        u = grids.GridVariable(grids.GridArray(jnp.zeros((4, 4)), (1.0, 0.5), grid), bc)
        c = grids.GridVariable(grids.GridArray(jnp.zeros((4, 4)), (0.5, 0.5), grid), bc)
        flux_bc = boundaries.get_advection_flux_bc_from_velocity_and_scalar(u, c, 0)
        assert flux_bc.types == ((BCType.PERIODIC, BCType.PERIODIC),) * 2
