"""Bénard-cell-distance reward shaping (2D).

Behavioral parity: reference wrappers/rbc_reward_shaping.py — find peaks of
the mid-height vertical-velocity line (scipy.signal.find_peaks, height
threshold 0.001), compute the maximum pairwise periodic distance over
x in [0, 2 pi), zeroing pairs with no down-welling between them (such pairs
belong to the same convection cell), then shape

    reward <- (1 - w) reward + w (pi - cell_distance) / pi

and expose info["cell_dist"]. A jittable batched implementation of the same
computation lives in ``rbc_gym_tpu.wrappers.functional`` for the vector env
pipeline.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import gymnasium as gym
import numpy as np
from scipy.signal import find_peaks

from rbc_gym_tpu.envs.rbc2d import RBCField


def compute_cell_distances(
    state: np.ndarray, state_shape, use_avg: bool = False
) -> float:
    """Max pairwise periodic distance between Bénard cells (host-side).

    ``state``: (C, nz, nx) as found in the 2D env's info dict.
    """
    if use_avg:
        uy = state[RBCField.UY].mean(axis=0)
    else:
        uy = state[RBCField.UY][int(state_shape[0] / 2) - 1]

    peaks, _ = find_peaks(uy, height=0.001)
    nx = state_shape[1]
    domain_x = np.linspace(0, 2 * np.pi, nx, endpoint=False)

    if len(peaks) <= 1:
        return 0.0

    best = 0.0
    for i in range(len(peaks)):
        for j in range(i + 1, len(peaks)):
            d1 = abs(domain_x[peaks[j]] - domain_x[peaks[i]])
            d2 = 2 * np.pi - d1
            d = min(d1, d2)
            # pairs with no down-welling between them are the same cell
            if d1 < d2:
                if np.all(uy[peaks[i] : peaks[j]] > 0):
                    d = 0.0
            else:
                if np.all(uy[peaks[j] :] > 0) and np.all(uy[: peaks[i]] > 0):
                    d = 0.0
            best = max(best, d)
    return float(best)


class RBCRewardShaping(gym.Wrapper):
    """Shape the reward with the distance between Bénard cells."""

    def __init__(
        self, env: gym.Env, shaping_weight: float, debug_cell_dist: bool = False
    ):
        super().__init__(env)
        self.logger = logging.getLogger(__name__)
        self.shaping_weight = shaping_weight
        self.debug_cell_dist = debug_cell_dist
        self.size_state = env.unwrapped.state_shape

    def reset(
        self,
        seed: int | None = None,
        options: Dict[str, Any] | None = None,
    ) -> Tuple[Any, Dict[str, Any]]:
        return self.env.reset(seed=seed, options=options)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        cd = compute_cell_distances(info["state"], self.size_state)
        reward = self.__apply_reward_shaping(cd, reward)
        info["cell_dist"] = cd
        return obs, reward, terminated, truncated, info

    def __apply_reward_shaping(self, cell_distances, reward) -> float:
        w = self.shaping_weight
        cd_normalized = (-cell_distances + np.pi) / np.pi
        reward = (1 - w) * reward + w * cd_normalized
        if np.isnan(reward):
            self.logger.error("Reward is NaN")
        return reward
