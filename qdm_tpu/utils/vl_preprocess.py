"""Vision-language input preprocessing — parity with the reference's
Qwen-VL utilities (utils/qwen_vl_utils.py:53-338): pixel-budgeted smart
resizing, image fetching/normalization, and frame-count selection for
video (decoding itself gated on local codecs).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 768 * 28 * 28
VIDEO_TOTAL_PIXELS = 24576 * 28 * 28
FPS = 2.0
FRAME_FACTOR = 2
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 768


def round_by_factor(n: float, factor: int) -> int:
    return round(n / factor) * factor


def ceil_by_factor(n: float, factor: int) -> int:
    return math.ceil(n / factor) * factor


def floor_by_factor(n: float, factor: int) -> int:
    return math.floor(n / factor) * factor


def smart_resize(height: int, width: int, factor: int = IMAGE_FACTOR,
                 min_pixels: int = MIN_PIXELS, max_pixels: int = MAX_PIXELS
                 ) -> Tuple[int, int]:
    """Resize to factor-aligned dims within a pixel budget, preserving
    aspect ratio (qwen_vl_utils.py:53-80)."""
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"aspect ratio must be < {MAX_RATIO}, got "
            f"{max(height, width) / min(height, width)}")
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = floor_by_factor(height / beta, factor)
        w_bar = floor_by_factor(width / beta, factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def fetch_image(image, size_factor: int = IMAGE_FACTOR,
                min_pixels: int = MIN_PIXELS, max_pixels: int = MAX_PIXELS
                ) -> np.ndarray:
    """Load + smart-resize an image to a normalized NHWC float array
    (qwen_vl_utils.py:82-125; local paths / PIL images / arrays — no
    URL fetching in this zero-egress environment)."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        img = Image.fromarray((image * 255).astype(np.uint8)
                              if image.dtype != np.uint8 else image)
    elif isinstance(image, Image.Image):
        img = image
    elif isinstance(image, str):
        path = image[len("file://"):] if image.startswith("file://") else image
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        img = Image.open(path)
    else:
        raise TypeError(type(image))
    img = img.convert("RGB")
    h, w = smart_resize(img.height, img.width, size_factor, min_pixels, max_pixels)
    img = img.resize((w, h))
    return np.asarray(img, np.float32) / 255.0


def smart_nframes(total_frames: int, video_fps: float, fps: float = FPS,
                  min_frames: int = FPS_MIN_FRAMES,
                  max_frames: int = FPS_MAX_FRAMES) -> int:
    """Frame-count selection (qwen_vl_utils.py:127-163)."""
    min_frames = ceil_by_factor(min_frames, FRAME_FACTOR)
    max_frames = floor_by_factor(min(max_frames, total_frames), FRAME_FACTOR)
    nframes = total_frames / video_fps * fps
    nframes = min(max(nframes, min_frames), max_frames)
    nframes = floor_by_factor(nframes, FRAME_FACTOR)
    if not (FRAME_FACTOR <= nframes <= total_frames):
        raise ValueError(f"invalid nframes {nframes} for {total_frames} frames")
    return int(nframes)


def fetch_video(ele: dict, image_factor: int = IMAGE_FACTOR) -> np.ndarray:
    """Video-input parity with the reference's fetch_video
    (qwen_vl_utils.py:257-301) WITHOUT requiring codecs:

    * list/tuple of frames (paths / PIL images / arrays) — fetched
      individually and padded to a FRAME_FACTOR multiple by repeating
      the last frame (the reference's list branch, :287-301);
    * directory path — sorted frame-image listing, treated as a list;
    * pre-decoded (T, H, W, C) array — temporally subsampled with
      smart_nframes (``video_fps`` key, default FPS) then
      smart-resized under the per-frame video pixel budget (the
      reference's decoded-tensor branch, :262-286);
    * encoded video file path — raises (decord/torchvision codecs are
      not in this environment).

    Returns a (T, H, W, C) float array in [0, 1]."""
    video = ele["video"]
    if isinstance(video, str):
        path = video[len("file://"):] if video.startswith("file://") else video
        if os.path.isdir(path):
            exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".npy")
            video = [os.path.join(path, f) for f in sorted(os.listdir(path))
                     if f.lower().endswith(exts)]
            if not video:
                raise ValueError(f"no frame images in directory {path}")
        else:
            raise NotImplementedError(
                "decoding encoded video files needs torchvision/decord "
                "(not in this environment); pass a frame list, a frame "
                "directory, or a pre-decoded (T,H,W,C) array instead")

    if isinstance(video, np.ndarray):
        # pre-decoded frames: temporal subsample + budgeted resize
        if video.ndim != 4:
            raise ValueError(f"expected (T,H,W,C) frames, got {video.shape}")
        total, h, w = video.shape[0], video.shape[1], video.shape[2]
        nframes = smart_nframes(total, float(ele.get("video_fps", FPS)),
                                fps=float(ele.get("fps", FPS)),
                                min_frames=ele.get("min_frames", FPS_MIN_FRAMES),
                                max_frames=ele.get("max_frames", FPS_MAX_FRAMES))
        idx = np.round(np.linspace(0, total - 1, nframes)).astype(int)
        frames = video[idx]
        min_pixels = ele.get("min_pixels", VIDEO_MIN_PIXELS)
        total_pixels = ele.get("total_pixels", VIDEO_TOTAL_PIXELS)
        max_pixels = max(min(VIDEO_MAX_PIXELS,
                             total_pixels / nframes * FRAME_FACTOR),
                         int(min_pixels * 1.05))
        max_pixels = ele.get("max_pixels", max_pixels)
        if "resized_height" in ele and "resized_width" in ele:
            rh, rw = smart_resize(ele["resized_height"], ele["resized_width"],
                                  factor=image_factor)
        else:
            rh, rw = smart_resize(h, w, factor=image_factor,
                                  min_pixels=min_pixels, max_pixels=max_pixels)
        from PIL import Image

        out = np.stack([
            np.asarray(Image.fromarray(
                (f * 255).astype(np.uint8) if f.dtype != np.uint8 else f
            ).convert("RGB").resize((rw, rh), Image.BICUBIC), np.float32) / 255.0
            for f in frames])
        return out

    if isinstance(video, (list, tuple)):
        info = {k: v for k, v in ele.items() if k not in ("type", "video")}
        frames = []
        for el in video:
            if isinstance(el, str) and el.endswith(".npy"):
                el = np.load(el)
            frames.append(fetch_image(
                el, size_factor=image_factor,
                min_pixels=info.get("min_pixels", MIN_PIXELS),
                max_pixels=info.get("max_pixels", MAX_PIXELS)))
        nframes = ceil_by_factor(len(frames), FRAME_FACTOR)
        frames.extend([frames[-1]] * (nframes - len(frames)))
        shapes = {f.shape for f in frames}
        if len(shapes) > 1:
            # mixed source sizes: resize everything to the first frame
            from PIL import Image

            h0, w0 = frames[0].shape[:2]
            frames = [f if f.shape[:2] == (h0, w0) else
                      np.asarray(Image.fromarray(
                          (f * 255).astype(np.uint8)).resize((w0, h0),
                                                             Image.BICUBIC),
                                 np.float32) / 255.0
                      for f in frames]
        return np.stack(frames)
    raise TypeError(type(video))


def process_vision_info(conversations: List[dict]):
    """Collect image and video inputs from chat-format messages
    (qwen_vl_utils.py:304-338).  Videos are handled codec-free via
    :func:`fetch_video` (frame lists / directories / pre-decoded
    arrays)."""
    images, videos = [], []
    msgs = conversations if isinstance(conversations[0], dict) else \
        [m for conv in conversations for m in conv]
    for msg in msgs:
        content = msg.get("content")
        if not isinstance(content, list):
            continue
        for ele in content:
            if ele.get("type") == "image" or "image" in ele:
                images.append(fetch_image(ele.get("image")))
            elif ele.get("type") == "video" or "video" in ele:
                videos.append(fetch_video(ele))
    return images or None, videos or None
