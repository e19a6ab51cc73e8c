"""
ketos convert subcommand (reference: kraken/ketos/weights.py): converts
training checkpoints into plain weights files.
"""
import logging

import click

logger = logging.getLogger('kraken')


@click.command('convert')
@click.pass_context
@click.option('-o', '--output', type=click.Path(), default='model.safetensors')
@click.option('--format', 'fmt', default='safetensors',
              type=click.Choice(['safetensors', 'coreml']))
@click.argument('checkpoint', nargs=1, type=click.Path(exists=True, dir_okay=False))
def convert(ctx, output, fmt, checkpoint):
    """
    Converts a training checkpoint into a deployable weights file.
    """
    from kraken_tpu.train import convert_checkpoint
    from kraken_tpu.ketos import message

    convert_checkpoint(checkpoint, output, format=fmt)
    message(f'Model written to {output}')
