"""LR schedules with torch semantics.

torch.optim.lr_scheduler.CosineAnnealingLR stepped once per epoch
(reference SimpleTrain.py:29, MMETrainingModule.py:21-22): closed form
``eta_min + (lr0 - eta_min) * (1 + cos(pi * epoch / T_max)) / 2``, which
keeps oscillating with period 2*T_max past T_max — the reference trains
175 epochs against T_max=25, so the oscillation is part of the recipe.
"""
from __future__ import annotations

import math


def cosine_annealing(lr0: float, eta_min: float, t_max: int, epoch: int) -> float:
    return eta_min + (lr0 - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2
