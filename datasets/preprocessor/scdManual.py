"""Reference-compatible profile path (reference:
datasets/preprocessor/scdManual.py): the WSI->clips preprocessing profile,
usable directly with `preprocess.py -p datasets.preprocessor.scdManual`."""

from scd_resnet_tpu.data.preprocess import (
    decode_annotations,
    generate_archive,
    generateArchieve,
)

__all__ = ["generateArchieve", "generate_archive", "decode_annotations"]
