"""Initial-condition checkpoint banks.

The reference generates banks of burned-in turbulent states offline
(scripts/create_checkpoints_2D.sh -> sim/rbc_sim2D.jl:14-72) and loads a
random episode at reset (sim/rbc_sim2D.jl:173-186). File format: HDF5 with
datasets ``b``/``u``/``w`` (+``v`` in 3D), Julia order (episodes, nx, [ny,]
nz) — h5py therefore sees reversed axes (nz, [ny,] nx, episodes) — and attrs
``num_episodes`` / ``start_seed``. ``w`` has nz+1 vertical face points
(staggered grid).

This module reads and writes that exact layout (so reference-generated banks
drop in unchanged) and adds a native ``.npz`` format for TPU-side generation
where h5py round-trips aren't needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present on target images
    h5py = None


@dataclasses.dataclass
class CheckpointBank2D:
    """Episode bank in solver order: (episodes, nx, nz[+1])."""

    b: np.ndarray  # (E, nx, nz)
    u: np.ndarray  # (E, nx, nz)
    w: np.ndarray  # (E, nx, nz + 1)
    start_seed: int = 0

    @property
    def num_episodes(self) -> int:
        return self.b.shape[0]


@dataclasses.dataclass
class CheckpointBank3D:
    """Episode bank in solver order: (episodes, nx, ny, nz[+1])."""

    b: np.ndarray
    u: np.ndarray
    v: np.ndarray
    w: np.ndarray
    start_seed: int = 0

    @property
    def num_episodes(self) -> int:
        return self.b.shape[0]


def _require_h5py():
    if h5py is None:
        raise ImportError("h5py is required for HDF5 checkpoint banks")


def load_bank_2d(path: str) -> CheckpointBank2D:
    """Load a 2D bank from either reference HDF5 or native .npz."""
    if str(path).endswith(".npz"):
        d = np.load(path)
        return CheckpointBank2D(
            b=d["b"], u=d["u"], w=d["w"], start_seed=int(d.get("start_seed", 0))
        )
    _require_h5py()
    with h5py.File(path, "r") as f:
        # file dims (Julia order): (E, nx, 1, nz); h5py view: (nz, 1, nx, E)
        b = np.transpose(f["b"][...], (3, 2, 0, 1))[..., 0]  # (E, nx, nz)
        u = np.transpose(f["u"][...], (3, 2, 0, 1))[..., 0]
        w = np.transpose(f["w"][...], (3, 2, 0, 1))[..., 0]
        seed = int(f.attrs.get("start_seed", 0))
    return CheckpointBank2D(b=b, u=u, w=w, start_seed=seed)


def save_bank_2d(path: str, bank: CheckpointBank2D) -> None:
    if str(path).endswith(".npz"):
        np.savez_compressed(
            path, b=bank.b, u=bank.u, w=bank.w, start_seed=bank.start_seed
        )
        return
    _require_h5py()
    with h5py.File(path, "w") as f:
        f.attrs["num_episodes"] = bank.num_episodes
        f.attrs["start_seed"] = bank.start_seed
        # write in the layout h5py sees for reference files: (nz, 1, nx, E)
        for name, arr in (("b", bank.b), ("u", bank.u), ("w", bank.w)):
            f.create_dataset(
                name, data=np.transpose(arr[:, :, None, :], (3, 2, 1, 0))
            )


def load_bank_3d(path: str) -> CheckpointBank3D:
    if str(path).endswith(".npz"):
        d = np.load(path)
        return CheckpointBank3D(
            b=d["b"],
            u=d["u"],
            v=d["v"],
            w=d["w"],
            start_seed=int(d.get("start_seed", 0)),
        )
    _require_h5py()
    with h5py.File(path, "r") as f:
        # file dims (E, nx, ny, nz); h5py view: (nz, ny, nx, E)
        def rd(name):
            return np.transpose(f[name][...], (3, 2, 1, 0))  # (E, nx, ny, nz)

        bank = CheckpointBank3D(
            b=rd("b"),
            u=rd("u"),
            v=rd("v"),
            w=rd("w"),
            start_seed=int(f.attrs.get("start_seed", 0)),
        )
    return bank


def save_bank_3d(path: str, bank: CheckpointBank3D) -> None:
    if str(path).endswith(".npz"):
        np.savez_compressed(
            path,
            b=bank.b,
            u=bank.u,
            v=bank.v,
            w=bank.w,
            start_seed=bank.start_seed,
        )
        return
    _require_h5py()
    with h5py.File(path, "w") as f:
        f.attrs["num_episodes"] = bank.num_episodes
        f.attrs["start_seed"] = bank.start_seed
        for name, arr in (
            ("b", bank.b),
            ("u", bank.u),
            ("v", bank.v),
            ("w", bank.w),
        ):
            f.create_dataset(name, data=np.transpose(arr, (3, 2, 1, 0)))
