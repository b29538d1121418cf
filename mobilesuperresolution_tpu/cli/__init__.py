"""CLI entry points (the reference's L6 scripts, SURVEY §1).

Each is an argparse main() with the reference's plugin-injection idiom: core
flags first, then the chosen dataset module and the models package add their
own flags (pretrain.py:329-337)."""
