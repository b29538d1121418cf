"""Dataset registry.

Each dataset module exposes ``update_argparser(parser)`` and
``get_dataset(mode, params)``, preserving the reference's plugin-injection
idiom (datasets/__init__.py:11-26, pretrain.py:329-337) behind a registry
lookup instead of importlib-by-name.

All file roots are config-driven (--data_dir), replacing the reference's
hard-coded absolute paths (SURVEY §7.4).
"""

import importlib

_DATASET_MODULES = {
    "div2k": "mobilesuperresolution_tpu.data.div2k",
    "set5": "mobilesuperresolution_tpu.data.eval_sets",
    "set14": "mobilesuperresolution_tpu.data.eval_sets",
    "bsds100": "mobilesuperresolution_tpu.data.eval_sets",
    "urban100": "mobilesuperresolution_tpu.data.eval_sets",
    "reds": "mobilesuperresolution_tpu.data.reds",
    "vimeo": "mobilesuperresolution_tpu.data.vimeo",
    "nemo": "mobilesuperresolution_tpu.data.nemo",
    "reds_with_mv": "mobilesuperresolution_tpu.data.reds_with_mv",
    "synthetic_isr": "mobilesuperresolution_tpu.data.synthetic_module",
    "synthetic_vsr": "mobilesuperresolution_tpu.data.synthetic_module",
}


def update_argparser(parser):
    """Base flags shared by every dataset (reference datasets/__init__.py)."""
    parser.add_argument("--train_batch_size", type=int, default=32)
    parser.add_argument("--eval_batch_size", type=int, default=32)
    parser.add_argument("--num_data_threads", type=int, default=8)
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--cache_dir", type=str, default="data/cache")
    parser.add_argument("--cache_compress", type=int, default=1,
                        help="1 = zlib-compress new cache entries (the "
                        "reference's LZF/blosc HDF5 role); 0 = raw .npy "
                        "with mmap reads. Reads accept both forms.")


def get_dataset_module(name):
    if name not in _DATASET_MODULES:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(_DATASET_MODULES)}")
    mod = importlib.import_module(_DATASET_MODULES[name])
    # eval_sets / synthetic host several named datasets; bind the name
    if hasattr(mod, "bind"):
        return mod.bind(name)
    return mod
