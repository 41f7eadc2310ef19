"""Offline preprocessing profile: WSI + annotations -> `.d` training archive.

Re-design of datasets/preprocessor/scdManual.py:

- annotation decode (58-106): lines ``head.x;head.y;tail.x;tail.y;
  minorWidth;haloRadius`` -> 8-field loc records in /4 heatmap coordinates
  ``[ctX, ctY, offX, offY, majX, majY, minL, halo]``;
- reflect padding to the configured margins plus the x8 mirror replication
  of bounding boxes (142-155);
- 16x repeated random rotation U(-15 deg, 15 deg) (129, 166-177) — here the
  16 rotations run as ONE vmapped, jit-compiled device batch instead of a
  host loop per repeat;
- tiling into ``destinationSize`` clips with per-clip bbox selection
  (182-199);
- archive contents: samples/locs npy + object-count.json + dataset.json —
  written INTO the zip handle (the reference dumped to a hardcoded temp dir
  and left the zip empty, scdManual.py:204-230 / SURVEY.md defect #5).

Documented divergence: image and coordinates rotate about the SAME center
(the padded image center). The reference rotates the padded image about its
center but the coordinates about the unpadded center (scdManual.py:168-173
vs 236-247), skewing labels by margin/4 when margins are nonzero; we keep
the geometry self-consistent (metric-level parity per SURVEY.md).
"""

from __future__ import annotations

import io
import json
import math
import os
from typing import Dict, List, Optional

import numpy as np

from scd_resnet_tpu.core.logging import Logger
from scd_resnet_tpu.ops.image import grayscale_preprocess

REPEAT_GEN = 16  # scdManual.py:128


def decode_annotations(path: str, image_name: str) -> Optional[List[List[float]]]:
    """Parse one label .txt into 8-field /4-coordinate loc records
    (scdManual.py:58-106)."""
    attempt = os.path.join(path, os.path.splitext(image_name)[0] + ".txt")
    if not os.path.exists(attempt):
        return None
    locations: List[List[float]] = []
    with open(attempt) as f:
        for line in f.readlines():
            if len(line) <= 5:
                continue
            positions = [float(v) for v in line.split(";")]
            head = positions[0:2]
            tail = positions[2:4]
            minor_axis_length = positions[4]
            halo_radius = positions[5]

            center_raw = [(head[0] + tail[0]) / 2, (head[1] + tail[1]) / 2]
            center_int = [center_raw[0] // 4, center_raw[1] // 4]
            center_off = [
                center_raw[0] - center_int[0] * 4,
                center_raw[1] - center_int[1] * 4,
            ]
            major_axis = [(tail[0] - head[0]) / 8, (tail[1] - head[1]) / 8]
            major_mod = math.sqrt(major_axis[0] ** 2 + major_axis[1] ** 2)
            minor_mod = minor_axis_length / 8
            locations.append(
                [
                    center_int[0], center_int[1],
                    center_off[0], center_off[1],
                    major_axis[0], major_axis[1],
                    minor_mod, halo_radius / 4,
                ]
            )
    return locations


def _replicate_mirrors(locations: List[List[float]], width: int,
                       height: int) -> List[List[float]]:
    """x8 mirror reflection of boxes for the reflect-padded image
    (scdManual.py:142-155); coordinates are /4, width/height full-res px."""
    replicated = list(locations)
    for b in locations:
        x, y, ox, oy, mx, my, mn, hl = b
        w2 = width // 2
        h2 = height // 2
        replicated += [
            [x, -y, ox, -oy, mx, -my, mn, hl],
            [x, h2 - y - 2, ox, -oy, mx, -my, mn, hl],
            [-x, y, -ox, oy, -mx, my, mn, hl],
            [w2 - x - 2, y, -ox, oy, -mx, my, mn, hl],
            [w2 - x - 2, -y, -ox, -oy, -mx, -my, mn, hl],
            [-x, -y, -ox, -oy, -mx, -my, mn, hl],
            [w2 - x - 2, h2 - y - 2, -ox, -oy, -mx, -my, mn, hl],
            [-x, h2 - y - 2, -ox, -oy, -mx, -my, mn, hl],
        ]
    return replicated


def _rotate_images_batch(padded: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """All REPEAT_GEN rotations of one padded slide as a single device batch."""
    import jax
    import jax.numpy as jnp

    from scd_resnet_tpu.ops.augment import rotate

    fn = jax.jit(jax.vmap(rotate, in_axes=(None, 0)))
    return np.asarray(fn(jnp.asarray(padded), jnp.asarray(angles, jnp.float32)))


def _rotate_coords(locs: np.ndarray, center_x4: float, center_y4: float,
                   angle: float) -> np.ndarray:
    from scd_resnet_tpu.ops.augment import rotate_coordinates

    return np.asarray(rotate_coordinates(locs, center_x4, center_y4, angle))


def _debug_overlay(output_path: str, name: str, clip: np.ndarray,
                   locs: np.ndarray) -> None:
    """Write one overlay PNG next to the archive: clip + center/major-axis
    markers, for visual inspection of the generated geometry."""
    from PIL import Image, ImageDraw

    debug_dir = output_path + ".debug"
    os.makedirs(debug_dir, exist_ok=True)
    img = Image.fromarray(
        np.clip(clip, 0, 255).astype(np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(img)
    for loc in locs:
        cx = (loc[0] + 0.0) * 4 + loc[2]
        cy = (loc[1] + 0.0) * 4 + loc[3]
        draw.ellipse([cx - 3, cy - 3, cx + 3, cy + 3], outline=(255, 64, 64),
                     width=2)
        draw.line([(cx - loc[4] * 4, cy - loc[5] * 4),
                   (cx + loc[4] * 4, cy + loc[5] * 4)], fill=(64, 255, 64))
    img.save(os.path.join(debug_dir, name + ".png"))


def generate_archive(settings: Dict, image_file_names: List[str],
                     zip_archive) -> None:
    """Profile entry point (preprocess.py:70-71 contract): fill the zip
    with samples/, locs/, object-count.json, dataset.json."""
    count_dict: Dict[str, int] = {}
    names: List[str] = []
    rng = np.random.default_rng(settings.get("seed", 42))
    dest = settings["destinationSize"]
    margin = settings["margin"]

    for image_file in image_file_names:
        full_path = os.path.join(settings["inputImage"], image_file)
        from PIL import Image

        gray = grayscale_preprocess(np.asarray(Image.open(full_path)))
        image_name = os.path.splitext(image_file)[0]
        height, width = gray.shape

        pad_width = width + margin[0] + margin[2]
        pad_height = height + margin[1] + margin[3]
        if pad_width % dest != 0 or pad_height % dest != 0:
            # hard failure: proceeding would silently truncate the tile grid
            # (pad // dest) and drop image content; the reference at least
            # exited on geometry misfits (SURVEY.md §5 failure handling)
            raise ValueError(
                "padding cannot fit the destination size: image {}x{} + "
                "margins {} gives {}x{}, not a multiple of {}".format(
                    width, height, list(margin), pad_width, pad_height, dest
                )
            )

        locations = decode_annotations(settings["annotation"], image_file)
        if locations is None:
            continue

        # reflect pad (torch 'reflect' == reflect101) + bbox mirrors
        padded = np.pad(
            gray,
            ((margin[1], margin[3]), (margin[0], margin[2])),
            mode="reflect",
        ).astype(np.float32)
        replicated = _replicate_mirrors(locations, width, height)
        base_locs = np.asarray(replicated, np.float32)
        base_locs[:, 0] += margin[0] // 4
        base_locs[:, 1] += margin[1] // 4

        # 16 random rotations of the padded slide, one device batch
        angles = rng.uniform(0.0, 1.0, REPEAT_GEN) * 30.0 - 15.0
        rotated = _rotate_images_batch(padded, angles)

        general_id = 1
        for rep in range(REPEAT_GEN):
            if len(base_locs) > 0:
                locs = _rotate_coords(
                    base_locs.copy(), pad_width / 8.0, pad_height / 8.0,
                    float(angles[rep]),
                )
            else:
                locs = base_locs

            image = rotated[rep]
            for x in range(pad_width // dest):
                for y in range(pad_height // dest):
                    clip = image[y * dest : (y + 1) * dest,
                                 x * dest : (x + 1) * dest]
                    key = "{}.{}".format(image_name, general_id)
                    if len(locs) > 0:
                        full_x = locs[:, 0] * 4 + locs[:, 2]
                        full_y = locs[:, 1] * 4 + locs[:, 3]
                        inside = (
                            (full_x >= x * dest) & (full_x < (x + 1) * dest)
                            & (full_y >= y * dest) & (full_y < (y + 1) * dest)
                        )
                        bs = locs[inside].copy()
                        bs[:, 0] -= x * dest // 4
                        bs[:, 1] -= y * dest // 4
                    else:
                        bs = np.zeros((0, 8), np.float32)

                    count_dict[key] = len(bs)
                    name = "{}.{}.{}".format(image_name, rep, general_id)
                    for sub, payload in (
                        ("locs", bs.astype(np.float32)),
                        ("samples", clip.astype(np.float32)),
                    ):
                        buf = io.BytesIO()
                        np.save(buf, payload)
                        zip_archive.writestr(
                            "{}/{}.npy".format(sub, name), buf.getvalue()
                        )
                    names.append(name + ".npy")

                    # -v debug visualization (the reference's preprocess.py
                    # -v flag, 62-64): dump an overlay PNG of the first
                    # repeat's clips with their loc records
                    if settings.get("verbal") and rep == 0:
                        _debug_overlay(settings["outputPath"], name, clip, bs)
                    general_id += 1
        Logger.log("preprocessed {} ({} clips so far)".format(image_file, len(names)))

    zip_archive.writestr("object-count.json", json.dumps(count_dict))
    zip_archive.writestr("dataset.json", json.dumps({"names": names}))


# reference-compatible profile alias (preprocess.py:103-104 contract)
generateArchieve = generate_archive
