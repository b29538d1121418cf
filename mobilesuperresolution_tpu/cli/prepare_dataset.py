"""Dataset-cache preparation CLI (reference: prepare_dataset.py:5-20 —
instantiate datasets purely to force cache construction before distributed
training)."""

from mobilesuperresolution_tpu.cli.common_cli import base_parser, parse_with_plugins
from mobilesuperresolution_tpu.core import LoggingTool, modes


def main(argv=None):
    parser = base_parser("Build dataset caches")
    params, dataset_module = parse_with_plugins(parser, argv, with_models=False)
    logging = LoggingTool(params.job_dir)
    for mode in (modes.TRAIN, modes.EVAL):
        try:
            ds = dataset_module.get_dataset(mode, params)
            if hasattr(ds, "prepare_cache"):
                ds.prepare_cache()
            logging.info(f"{params.dataset} [{mode}]: {len(ds)} items cached")
        except NotImplementedError:
            logging.info(f"{params.dataset} [{mode}]: not available")


if __name__ == "__main__":
    main()
