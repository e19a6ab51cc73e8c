"""
Shared ketos CLI helpers (reference: kraken/ketos/util.py): YAML experiment
file loading and manifest expansion.
"""
import logging

logger = logging.getLogger('kraken')

__all__ = ['_load_yaml_config', 'expand_manifests']


def _load_yaml_config(ctx, param, value):
    """Eager --config callback seeding click's default map from a YAML file."""
    if not value:
        return value
    import yaml
    with open(value, 'r') as fp:
        config = yaml.safe_load(fp)
    ctx.default_map = config or {}
    return value


def expand_manifests(ctx, param, value):
    """Reads file lists from manifest files (one path per line)."""
    files = []
    for manifest in value:
        with open(manifest, 'r') as fp:
            files.extend(line.strip() for line in fp if line.strip())
    return files
