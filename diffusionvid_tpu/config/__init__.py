from .node import CfgNode
from .defaults import get_default_cfg

__all__ = ["CfgNode", "get_default_cfg", "load_config"]


def load_config(config_file: str | None = None, opts: list | None = None) -> CfgNode:
    """Build a config: defaults → experiment YAML → CLI ``KEY VALUE`` opts.

    Mirrors the reference merge order (``tools/train_net.py:202-207``) minus
    the per-GPU-count base file, which is subsumed by the defaults here.
    """
    c = get_default_cfg()
    if config_file:
        c.merge_from_file(config_file)
    if opts:
        c.merge_from_list(list(opts))
    return c
