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


def process_vision_info(conversations: List[dict]):
    """Collect image inputs from chat-format messages
    (qwen_vl_utils.py:321-338); video decoding requires torchvision/
    decord and is gated off here."""
    images, videos = [], None
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
                raise NotImplementedError(
                    "video decoding needs torchvision/decord (not in env)")
    return images or None, videos
