"""Policy/value models: Flax-native (TPU training path) + torch/SB3 compat."""

from rbc_gym_tpu.models.flax_nets import (
    ActorCriticNetwork,
    FluidCNNExtractor,
    RBCActorCritic,
    RBCActorCritic2D,
    periodic_pad_3d,
)

__all__ = [
    "ActorCriticNetwork",
    "FluidCNNExtractor",
    "RBCActorCritic",
    "RBCActorCritic2D",
    "periodic_pad_3d",
]


def __getattr__(name):
    # torch modules are imported lazily (torch import is heavy)
    if name in ("PeriodicPad3D", "FluidCNN", "ActorCriticTorso",
                "CustomActorCriticPolicy"):
        from rbc_gym_tpu.models import torch_nets

        return getattr(torch_nets, name)
    raise AttributeError(name)
