"""LR-schedule visualization — the reference ``utils/plotLR.py``.

Plots the cosine-annealing schedules the training regimes actually use
(AdamW lr and the MME SGD per-group lrs) over ``--epochs`` epochs to a
PNG (matplotlib Agg, headless-safe).
"""
from __future__ import annotations

import argparse


def main(args=None) -> str:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-lr", "--learningRate", type=float, default=1e-3)
    p.add_argument("--lrRatio", type=float, default=1000)
    p.add_argument("--epochs", type=int, default=175)
    p.add_argument("--out", default="lr_schedule.png")
    args = p.parse_args(args)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..train.schedules import cosine_annealing

    lr0, ratio = args.learningRate, args.lrRatio
    epochs = range(args.epochs)
    adamw = [cosine_annealing(lr0, lr0 / ratio, 25, e) for e in epochs]
    sgd_fe = [cosine_annealing(lr0 / 3, lr0 * 1e-3, 25, e) for e in epochs]
    sgd_cls = [cosine_annealing(lr0, lr0 * 1e-3, 25, e) for e in epochs]

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(epochs, adamw, label="AdamW (supervised / MME phase F)")
    ax.plot(epochs, sgd_fe, label="SGD featureExtractor (MME phase G)")
    ax.plot(epochs, sgd_cls, label="SGD classifier (MME phase G)")
    ax.set_xlabel("epoch")
    ax.set_ylabel("learning rate")
    ax.set_yscale("log")
    ax.legend()
    ax.set_title("CosineAnnealingLR(T_max=25) schedules")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    main()
