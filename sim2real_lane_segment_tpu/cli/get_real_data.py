"""Real-data download CLI — the reference ``utils/getRealData.py``.

Same interface (reference getRealData.py:12-38): downloads the real
Duckietown videos listed in a URL file (``realVideoURLs.txt``) and
optionally explodes them into PNG frames.

Uses urllib instead of shelling out to wget.  In a zero-egress
environment downloads fail cleanly per file and the explode step still
works on already-present videos.
"""
from __future__ import annotations

import argparse
import logging
import os
import urllib.request

import cv2

from . import common

log = logging.getLogger(__name__)


def download(url: str, out_dir: str) -> str | None:
    fname = os.path.join(out_dir, url.rstrip("/").split("/")[-1])
    if os.path.exists(fname):
        return fname
    try:
        urllib.request.urlretrieve(url, fname)
        return fname
    except Exception as e:
        log.warning("download failed for %s: %s", url, e)
        return None


def explode(video_path: str, frames_dir: str, counter: int) -> int:
    cap = cv2.VideoCapture(video_path)
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        cv2.imwrite(os.path.join(frames_dir, f"{counter:06d}.png"), frame)
        counter += 1
    cap.release()
    return counter


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--urlFile", type=str, default="realVideoURLs.txt")
    p.add_argument("--outputPath", type=str, default="./realVideos")
    p.add_argument("--explode", action="store_true",
                   help="Explode downloaded videos into PNG frames")
    p.add_argument("--framesPath", type=str, default="./realFrames")
    args = p.parse_args(args)

    os.makedirs(args.outputPath, exist_ok=True)
    urls = []
    if os.path.exists(args.urlFile):
        with open(args.urlFile) as f:
            urls = [u.strip() for u in f if u.strip()]

    videos = []
    for url in urls:
        got = download(url, args.outputPath)
        if got:
            videos.append(got)
    # include any videos already on disk
    for f in sorted(os.listdir(args.outputPath)):
        path = os.path.join(args.outputPath, f)
        if path not in videos and f.lower().endswith((".avi", ".mp4", ".mov")):
            videos.append(path)

    n_frames = 0
    if args.explode:
        os.makedirs(args.framesPath, exist_ok=True)
        for v in videos:
            n_frames = explode(v, args.framesPath, n_frames)

    log.info("videos: %d, frames: %d", len(videos), n_frames)
    return {"videos": len(videos), "frames": n_frames}


if __name__ == "__main__":
    main()
