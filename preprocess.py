"""preprocess.py — clip whole-slide images into training archives.

CLI mirror of the reference (reference: preprocess.py:42-109):
``python preprocess.py out.d -i imgs/ -a annots/ -s 512 -t 0.5
-m '0 0 0 0' -p <profile>``.

The profile contract is unchanged: a module exporting
``generateArchieve(settings, imageFileNames, zipArchieve)``. The default
profile is the built-in TPU pipeline
(``scd_resnet_tpu.data.preprocess``); the reference profile name
``datasets.preprocessor.scdManual`` is aliased to it.
"""

from __future__ import annotations

import argparse
import importlib
import os
import pprint
import re
import zipfile

_PROFILE_ALIASES = {
    "datasets.preprocessor.scdManual": "scd_resnet_tpu.data.preprocess",
}


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="preprocess.py - clip whole-slide images and decode "
        "annotations into heatmap training archives."
    )
    parser.add_argument("outputZipPath", type=str,
                        help="location of the output zipped samples")
    parser.add_argument("-i", dest="inputImage", type=str,
                        help="input image folder")
    parser.add_argument("-a", dest="annotation", type=str,
                        help="input annotation folder")
    parser.add_argument("-s", dest="destinationSize", default=512, type=int,
                        help="destination clip size")
    parser.add_argument("-t", dest="iouThreshold", default=0.7, type=float,
                        help="accepted for reference-CLI compatibility; UNUSED"
                        " — the reference's decode takes iouThreshold and"
                        " ignores it too (scdManual.py:58-106); gaussian"
                        " radii are rendered train-side with the fixed"
                        " THRESHOLD_IOU")
    parser.add_argument("-v", dest="verbal", const=True, default=False,
                        action="store_const", help="debug visualization flag")
    parser.add_argument("-m", dest="margin", default="0 0 0 0", type=str,
                        help="border margins: 'left top right bottom'")
    parser.add_argument("-p", dest="profile", type=str,
                        default="scd_resnet_tpu.data.preprocess",
                        help="preprocess profile module")
    parser.add_argument("-gpu", dest="useGPU", const=True, default=False,
                        action="store_const",
                        help="run the vmapped rotation batches on the "
                        "accelerator (default: CPU — the chip is "
                        "single-tenant and a preprocess run must not wedge "
                        "a training client)")
    return parser.parse_args()


def main():
    from scd_resnet_tpu.core.compile_cache import enable_compilation_cache
    from scd_resnet_tpu.core.logging import Logger

    enable_compilation_cache()
    args = parse_arguments()
    Logger.info(":: preprocess.py :: generate samples from whole slide images")
    if not args.useGPU:
        import jax

        jax.config.update("jax_platforms", "cpu")
    settings = {
        "outputPath": args.outputZipPath,
        "inputImage": args.inputImage,
        "annotation": args.annotation,
        "destinationSize": args.destinationSize,
        "margin": [int(i) for i in args.margin.split(" ")],
        "iouThreshold": args.iouThreshold,
        "verbal": bool(args.verbal),
        "profile": args.profile,
    }
    pprint.pprint(settings, indent=4)

    image_file_names = os.listdir(settings["inputImage"])
    image_file_names = sorted(
        image_file_names, key=lambda i: int(re.match(r"(\d+)", i).group())
    )

    profile_name = _PROFILE_ALIASES.get(settings["profile"], settings["profile"])
    profile = importlib.import_module(profile_name)

    with zipfile.ZipFile(settings["outputPath"], "w", zipfile.ZIP_DEFLATED) as zf:
        profile.generateArchieve(settings, image_file_names, zf)

    Logger.info(":: preprocess.py :: task completed successfully")


if __name__ == "__main__":
    main()
