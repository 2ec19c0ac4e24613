"""Datasets and normalizers for trajectory-to-trajectory training.

TPU-native counterpart of the reference's ``fno/datasets.py``
(UnitGaussianNormalizer: datasets.py:21, SpatialGaussianNormalizer: :107,
NavierStokesDataset: :165, SpatioTemporalDataset: :373,
SpatioTemporalDatasetFixedTime: :456).

Host-side data stays numpy: batches are assembled on CPU and handed to JAX
once per step (``jax.device_put`` with an optional batch sharding — see
``tpu_cfd.parallel``), which keeps host→HBM transfers to one per step. Both
``.npz`` (this framework's native format) and torch ``.pt`` trajectory dicts
(the reference's format) load interchangeably, so reference-generated data
works unmodified.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray


class UnitGaussianNormalizer:
    """Pointwise Gaussian normalizer with resolution alignment.

    Counterpart of reference datasets.py:21-104 (sklearn-style naming,
    mean/std over the batch dim, ``jax.image.resize`` alignment for
    evaluation at a different resolution).
    """

    def __init__(self, eps: float = 1e-7, data: Optional[Array] = None):
        self.eps = eps
        self.mean: Optional[Array] = None
        self.std: Optional[Array] = None
        if data is not None:
            self.fit_transform(data)

    def fit_transform(self, x: Array) -> Array:
        x = np.asarray(x)
        self.mean = x.mean(0).astype(np.float32)
        self.std = x.std(0).astype(np.float32)
        return (x - self.mean) / (self.std + self.eps)

    def _align_shapes(self, x) -> Tuple[Array, Array]:
        size = x.shape[1:]
        mean, std = self.mean, self.std
        if tuple(size) != tuple(mean.shape):
            mean = np.asarray(jax.image.resize(jnp.asarray(mean), size, "linear"))
            std = np.asarray(jax.image.resize(jnp.asarray(std), size, "linear"))
        return mean, std

    def transform(self, x, align_shapes: bool = False):
        if self.mean is None:
            return x
        mean, std = (
            self._align_shapes(x) if align_shapes else (self.mean, self.std)
        )
        return (x - mean) / (std + self.eps)

    def inverse_transform(self, x, align_shapes: bool = True):
        if self.mean is None:
            return x
        mean, std = (
            self._align_shapes(x) if align_shapes else (self.mean, self.std)
        )
        return x * (std + self.eps) + mean

    # persistence mirrors reference datasets.py:313-346
    def save(self, path: Union[str, os.PathLike]):
        np.savez(path, mean=self.mean, std=self.std, eps=self.eps)

    @classmethod
    def load(cls, path: Union[str, os.PathLike]) -> "UnitGaussianNormalizer":
        z = np.load(path)
        norm = cls(eps=float(z["eps"]))
        norm.mean, norm.std = z["mean"], z["std"]
        return norm


class SpatialGaussianNormalizer(UnitGaussianNormalizer):
    """Normalizes over batch AND time dims; data shaped (N, n, n, T)."""

    def fit_transform(self, x: Array) -> Array:
        x = np.asarray(x)
        self.mean = x.mean((0, -1))[..., None].astype(np.float32)
        self.std = x.std((0, -1))[..., None].astype(np.float32)
        return (x - self.mean) / (self.std + self.eps)


def load_trajectory_dict(
    path: Union[str, os.PathLike],
    keys: Optional[Sequence[str]] = None,
) -> Dict[str, Array]:
    """Loads a trajectory dict from .npz (native) or torch .pt (reference).

    ``keys`` restricts which arrays are materialized — np.load is lazy per
    entry, so asking for one field of a multi-GB extra-vars dataset reads
    only that field instead of the whole archive.
    """
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            names = z.files if keys is None else [k for k in z.files if k in keys]
            return {k: z[k] for k in names}
    elif path.suffix in (".pt", ".pth"):
        import torch  # cpu torch: only for reading reference-format files

        data = torch.load(path, map_location="cpu", weights_only=False)
        return {
            k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in data.items()
        }
    elif path.suffix == ".mat":
        # MATLAB ≥v7.3 files are HDF5 (column-major storage, hence the
        # transpose); older versions go through scipy.io. The FNO-paper
        # datasets (ns_V1e-3_N5000_T50.mat etc.) ship in both vintages.
        import h5py

        if h5py.is_hdf5(path):
            with h5py.File(path, "r") as f:
                return {
                    k: np.asarray(f[k]).T
                    for k in f.keys()
                    if isinstance(f[k], h5py.Dataset)
                }
        import scipy.io as sio

        return {k: np.asarray(v) for k, v in sio.loadmat(path).items()
                if not k.startswith("__")}
    raise ValueError(f"unsupported data format: {path.suffix}")


class SpatioTemporalDataset:
    """Random-window trajectory dataset (reference datasets.py:373-453).

    Trajectories are stored ``(N, T, n, n)`` (torch-cfd puts time at dim -3);
    ``sample`` slices a random (or fixed ``T_start``) input window of
    ``steps`` frames and the following ``out_steps`` frames, returning
    time-last arrays ``(b, n, n, steps)`` ready for SFNO.
    """

    def __init__(
        self,
        data_path: Union[str, os.PathLike, Dict[str, Array]],
        n_samples: int = 1024,
        train: bool = True,
        fields: Sequence[str] = ("vorticity", "stream"),
        data_time_last: bool = False,
        steps: int = 10,
        out_steps: Optional[int] = None,
        T_start: Optional[int] = None,
        dtype=np.float32,
    ):
        self.fields = list(fields)
        self.steps = steps
        self.out_steps = out_steps if out_steps is not None else steps
        self.T_start = T_start
        self.dtype = dtype

        data = (
            data_path
            if isinstance(data_path, dict)
            else load_trajectory_dict(data_path, keys=self.fields)
        )
        data = {k: np.asarray(v) for k, v in data.items() if k in self.fields}
        # datasets generated without --extra-vars store auxiliary fields as
        # empty arrays — drop them so the default fields degrade gracefully,
        # but a requested field with no key at all (typo, or a dataset that
        # never recorded it) is a real mismatch and must be surfaced
        absent = [f for f in self.fields if f not in data]
        data = {k: v for k, v in data.items() if v.size}
        if self.fields[0] not in data:
            raise KeyError(
                f"primary field {self.fields[0]!r} not in dataset "
                f"(available: {sorted(data)})"
            )
        if absent:
            import warnings

            warnings.warn(
                f"requested fields {absent} not present in dataset "
                f"(available: {sorted(data)}); proceeding without them",
                stacklevel=2,
            )
        self.fields = [f for f in self.fields if f in data]
        first = data[self.fields[0]]
        if not data_time_last:
            # (N, T, n, n) -> (N, n, n, T)
            data = {k: np.moveaxis(v, 1, -1) for k, v in data.items()}
        n_total = first.shape[0]
        n_samples = min(n_samples, n_total)
        if train:
            data = {k: v[:n_samples] for k, v in data.items()}
        else:
            data = {k: v[-n_samples:] for k, v in data.items()}
        self.data = data
        self.n_samples = n_samples
        self.total_steps = self.data[self.fields[0]].shape[-1]

    def __len__(self) -> int:
        return self.n_samples

    def draw_starts(
        self, idx: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> np.ndarray:
        """Window starts for a batch — one independent draw PER SAMPLE (the
        reference draws one per __getitem__, datasets.py:431-453; per-batch
        windows reduce effective data diversity and slow convergence)."""
        idx = np.atleast_1d(np.asarray(idx))
        window = self.out_steps + self.steps
        if self.T_start is None:
            rng = np.random.default_rng() if rng is None else rng
            return rng.integers(0, self.total_steps - (window + 1), size=len(idx))
        return np.full(len(idx), self.T_start, dtype=np.int64)

    def sample(
        self, idx: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Slices input/output windows for a batch of sample indices."""
        idx = np.atleast_1d(np.asarray(idx))
        return self.sample_at(idx, self.draw_starts(idx, rng))

    def sample_at(
        self, idx: np.ndarray, starts: np.ndarray
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        """Deterministic window slicing at explicit per-sample ``starts``.

        The device-resident training path (pipeline.make_scan_epoch) gathers
        the same windows on device from the same (idx, starts) — this is the
        host reference for that equivalence.
        """
        idx = np.atleast_1d(np.asarray(idx))
        starts = np.atleast_1d(np.asarray(starts))
        inp_t = starts[:, None] + np.arange(self.steps)  # (b, steps)
        out_t = starts[:, None] + self.steps + np.arange(self.out_steps)

        def gather(arr, t_idx):
            # arr: (b, n, n, T); t_idx: (b, steps) -> (b, n, n, steps)
            return np.take_along_axis(
                arr, t_idx[:, None, None, :], axis=-1
            )

        inp = {
            f: gather(self.data[f][idx], inp_t).astype(self.dtype)
            for f in self.fields
        }
        out = {
            f: gather(self.data[f][idx], out_t).astype(self.dtype)
            for f in self.fields
        }
        inp["time_steps"] = inp_t
        out["time_steps"] = out_t
        return inp, out

    def epoch_indices(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One epoch's (idx, starts), each ``(n_batches, batch_size)`` int32.

        Draws from ``rng`` in exactly the order ``batches()`` does
        (permutation first, then one ``integers`` call per batch), so a
        same-seeded host loop and the device-resident scan path
        (pipeline.make_scan_epoch) see bitwise-identical batches.
        """
        order = (
            rng.permutation(self.n_samples) if shuffle else np.arange(self.n_samples)
        )
        idx, starts = [], []
        for i in range(0, self.n_samples - batch_size + 1, batch_size):
            chunk = order[i: i + batch_size]
            idx.append(chunk)
            starts.append(self.draw_starts(chunk, rng))
        return (np.asarray(idx, dtype=np.int32),
                np.asarray(starts, dtype=np.int32))

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        shuffle: bool = True,
    ):
        """Yields (input, output) dict batches for one epoch."""
        idx, starts = self.epoch_indices(batch_size, rng, shuffle)
        for chunk, s in zip(idx, starts):
            yield self.sample_at(chunk, s)


class SpatioTemporalDatasetFixedTime(SpatioTemporalDataset):
    """Fixed-window variant with normalization (reference datasets.py:456)."""

    def __init__(self, *args, normalize: bool = True, T_start: int = 0, **kwargs):
        super().__init__(*args, T_start=T_start, **kwargs)
        self.normalizers: Dict[str, SpatialGaussianNormalizer] = {}
        if normalize:
            for f in self.fields:
                norm = SpatialGaussianNormalizer()
                self.data[f] = norm.fit_transform(self.data[f])
                self.normalizers[f] = norm


class NavierStokesDataset:
    """FNO-paper-format dataset: (N, n, n, T) single tensor ``u``.

    Counterpart of reference datasets.py:165-370: loads .mat/.pt/.npz, slices
    ``time_steps_input`` frames as input channels and the following
    ``time_steps_output`` frames as targets, with optional subsampling and
    Gaussian normalization.
    """

    def __init__(
        self,
        data_path: Union[str, os.PathLike],
        n_samples: int = 1024,
        train: bool = True,
        time_steps_input: int = 10,
        time_steps_output: int = 40,
        subsample: int = 1,
        field: str = "u",
        normalize: bool = True,
        dtype=np.float32,
    ):
        data = load_trajectory_dict(data_path)
        u = np.asarray(data[field])
        s = subsample
        u = u[:, ::s, ::s, :]
        n_total = u.shape[0]
        n_samples = min(n_samples, n_total)
        u = u[:n_samples] if train else u[-n_samples:]
        self.a = u[..., :time_steps_input].astype(dtype)
        self.u = u[
            ..., time_steps_input: time_steps_input + time_steps_output
        ].astype(dtype)
        self.n_samples = n_samples
        self.normalizer: Optional[UnitGaussianNormalizer] = None
        if normalize:
            self.normalizer = UnitGaussianNormalizer()
            self.a = self.normalizer.fit_transform(self.a)

    def __len__(self) -> int:
        return self.n_samples

    def batches(self, batch_size: int, rng: np.random.Generator, shuffle=True):
        order = (
            rng.permutation(self.n_samples) if shuffle else np.arange(self.n_samples)
        )
        for i in range(0, self.n_samples - batch_size + 1, batch_size):
            idx = order[i: i + batch_size]
            yield {"a": self.a[idx], "u": self.u[idx]}
