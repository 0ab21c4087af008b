"""Learning-rate control: linear warmup, plateau decay, milestones.

Host-side replicas of the reference's schedule stack:
- linear warmup to the target LR over N steps, then hold
  (``transduction_model.py:185-189``),
- ReduceLROnPlateau: ×0.5 after ``patience`` epochs without (relative 1e-4)
  improvement of the validation metric (``transduction_model.py:179``,
  torch defaults: threshold 1e-4 'rel', cooldown 0),
- MultiStep: ×0.5 at fixed epoch milestones (``recognition_model.py:73``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence


def warmup_lr(step: int, target_lr: float, warmup_steps: int) -> float:
    """LR for global step (0-based); reference warms up over the first
    ``warmup_steps`` optimizer steps and then holds the target."""
    it = step + 1
    if warmup_steps > 0 and it <= warmup_steps:
        return it * target_lr / warmup_steps
    return target_lr


@dataclass
class ReduceLROnPlateau:
    """Tracks a min-metric; ``scale`` shrinks by ``factor`` on stagnation."""

    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    best: float = float("inf")
    num_bad_epochs: int = 0
    scale: float = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale *= self.factor
            self.num_bad_epochs = 0
        return self.scale


@dataclass
class MultiStepLR:
    """×gamma at each milestone epoch (epochs counted from 1 upward)."""

    milestones: Sequence[int] = (125, 150, 175)
    gamma: float = 0.5
    epoch: int = 0
    scale: float = 1.0

    def step(self) -> float:
        self.epoch += 1
        if self.epoch in set(self.milestones):
            self.scale *= self.gamma
        return self.scale
