#!/usr/bin/env python
"""
Computes per-file character error rates of a recognition model over ground
truth pages (reference: kraken/contrib/test_per_file.py).
"""
import click


@click.command()
@click.option('-m', '--model', type=click.Path(exists=True), required=True)
@click.option('-f', '--format-type', type=click.Choice(['xml', 'alto', 'page']),
              default='xml')
@click.option('--pad', type=int, default=16)
@click.argument('files', nargs=-1, type=click.Path(exists=True))
def cli(model, format_type, pad, files):
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.lib.util import open_image
    from kraken_tpu.tasks import RecognitionTaskModel
    from kraken_tpu.train.metrics import CharErrorRate
    from kraken_tpu.xml import XMLPage

    task = RecognitionTaskModel.load_model(model)
    config = RecognitionInferenceConfig(padding=pad)
    total = CharErrorRate()
    for fname in files:
        doc = XMLPage(fname, filetype=format_type)
        seg = doc.to_container()
        im = open_image(doc.imagename)
        cer = CharErrorRate()
        for record, line in zip(task.predict(im, seg, config), seg.lines):
            if line.text:
                cer.update(record.prediction, line.text)
                total.update(record.prediction, line.text)
        click.echo(f'{fname}\tCER {cer.compute() * 100:.2f}%')
    click.echo(f'TOTAL\tCER {total.compute() * 100:.2f}%')


if __name__ == '__main__':
    cli()
