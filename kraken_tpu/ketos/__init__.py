"""
kraken_tpu.ketos
~~~~~~~~~~~~~~~~

Training command line driver (reference: kraken/ketos/): subcommands for
recognition/segmentation/reading-order training and testing, dataset
compilation, checkpoint conversion, and model publishing, with YAML
experiment-file configuration.
"""
import logging
import warnings

import click

from kraken_tpu.lib import log

warnings.simplefilter('ignore', UserWarning)
logging.captureWarnings(True)
logger = logging.getLogger('kraken')

APP_NAME = 'kraken'


def message(msg: str, **styles) -> None:
    if logger.getEffectiveLevel() >= 30:
        click.secho(msg, **styles)


from kraken_tpu.ketos.util import _load_yaml_config, expand_manifests  # noqa: E402


@click.group(context_settings=dict(show_default=True))
@click.version_option(version='0.1.0', prog_name='ketos')
@click.option('-v', '--verbose', default=0, count=True)
@click.option('-s', '--seed', default=None, type=click.INT,
              help='Seed for numpy and JAX RNGs.')
@click.option('-d', '--device', default='auto', help='Select device to use.')
@click.option('--precision', type=click.Choice(['64', '32', 'bf16', '16']),
              default='32', help='Numerical precision for training.')
@click.option('--workers', default=1, type=click.IntRange(0),
              help='Number of data loading workers.')
@click.option('--threads', default=1, type=click.IntRange(1),
              help='Size of host thread pools.')
@click.option('--config', callback=_load_yaml_config, is_eager=True,
              expose_value=False, type=click.Path(exists=True),
              help='YAML experiment file with global options and per-command sections.')
def cli(verbose, seed, device, precision, workers, threads):
    """
    Training and dataset tooling.
    """
    ctx = click.get_current_context()
    if seed is not None:
        import numpy as np
        np.random.seed(seed)
    ctx.meta['verbose'] = verbose
    ctx.meta['device'] = device
    ctx.meta['precision'] = {'64': '64-true', '32': '32-true',
                             'bf16': 'bf16-true', '16': '16-true'}[precision]
    ctx.meta['workers'] = workers
    ctx.meta['threads'] = threads
    log.set_logger(logger, level=30 - min(10 * verbose, 20))


from kraken_tpu.ketos import recognition, segmentation, ro, dataset, weights, pretrain, repo  # noqa: E402

cli.add_command(recognition.train)
cli.add_command(recognition.test)
cli.add_command(segmentation.segtrain)
cli.add_command(segmentation.segtest)
cli.add_command(ro.rotrain)
cli.add_command(ro.roadd)
cli.add_command(dataset.compile)
cli.add_command(weights.convert)
cli.add_command(pretrain.pretrain)
cli.add_command(repo.publish)


# third-party subcommand discovery (reference: kraken/ketos/__init__.py:109-110)
from kraken_tpu.registry import register_cli_plugins  # noqa: E402
register_cli_plugins(cli, 'ketos.cli')


if __name__ == '__main__':
    cli()
