"""Registry adapters for the synthetic datasets (tests/smoke/bench)."""

from types import SimpleNamespace

from mobilesuperresolution_tpu.data import isr as _isr, vsr as _vsr
from mobilesuperresolution_tpu.data.synthetic import (
    SyntheticISRDataset,
    SyntheticVSRDataset,
)


def bind(name):
    if name == "synthetic_isr":

        def update_argparser(parser):
            _isr.update_argparser(parser)
            parser.add_argument(
                "--synthetic_textured",
                type=lambda v: v.lower() != "false",
                default=True,
                help="False = noise-free synthetic images (fully learnable).",
            )
            parser.set_defaults(num_patches=4, train_batch_size=8)

        def get_dataset(mode, params):
            return SyntheticISRDataset(mode, params)

    else:

        def update_argparser(parser):
            _vsr.update_argparser(parser)
            # lr_patch_size must fit INSIDE the 24x24 LR frames (96/scale=4) with
            # the width sampler's 2-px jitter margin — 24 would leave no
            # valid crop position and crash the first item
            parser.set_defaults(num_patches=2, train_batch_size=2, lr_patch_size=16)

        def get_dataset(mode, params):
            return SyntheticVSRDataset(mode, params)

    return SimpleNamespace(
        name=name, update_argparser=update_argparser, get_dataset=get_dataset
    )
