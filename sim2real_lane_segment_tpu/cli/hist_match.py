"""Histogram-matching CLI — the reference ``hist_match_datasets.py`` on TPU.

Same interface (reference hist_match_datasets.py:40-46): ``--ds_source``
(dataset rewritten in place), ``--ds_reference``, ``--no_shuffle``,
``--workers`` (accepted; device batching replaces the thread pool).

Note: the reference's ``--no_shuffle`` flag used ``action='store_false'``
so *passing* it enabled shuffling (a flagged quirk, SURVEY.md §7) — here
the flag does what it says and skips shuffling.

TPU-native difference: instead of one skimage call per image on a host
thread pool, source/reference pairs are batched through the jitted
``match_histograms_batch`` op; results are written back in place like the
reference's ``ds_source[idx] = ...``.
"""
from __future__ import annotations

import argparse
import logging
import random

import numpy as np

from . import common

log = logging.getLogger(__name__)


def main(args=None) -> int:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ds_source", type=str, required=True,
                   help="Dataset wanted to be changed.")
    p.add_argument("--ds_reference", type=str, required=True,
                   help="Dataset of matching reference.")
    p.add_argument("--no_shuffle", action="store_true",
                   help="Skip shuffling reference images before matching.")
    p.add_argument("--workers", type=int, default=4,
                   help="Accepted for interface parity (batching replaces threads).")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(args)
    common.setup_runtime()

    from ..data.datasets import RightLaneDataset
    from ..ops.histmatch import match_histograms_batch

    ds_source = RightLaneDataset(args.ds_source, have_labels=False)
    ds_reference = RightLaneDataset(args.ds_reference, have_labels=False)

    ref_idxes = list(range(len(ds_reference)))
    if not args.no_shuffle:
        random.shuffle(ref_idxes)

    n = len(ds_source)
    log.info("Matching histograms of %d images on device...", n)
    done = 0
    for start in range(0, n, args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, n)))
        srcs = np.stack([ds_source[i][0] for i in idxs])
        refs = np.stack([ds_reference[ref_idxes[i % len(ref_idxes)]][0]
                         for i in idxs])
        matched = np.asarray(match_histograms_batch(srcs, refs))
        for j, i in enumerate(idxs):
            ds_source[i] = matched[j]
        done += len(idxs)
    log.info("Finished matching histograms (%d images).", done)
    return done


if __name__ == "__main__":
    main()
