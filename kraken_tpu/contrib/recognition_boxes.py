#!/usr/bin/env python
"""
Draws per-character recognition boxes over a page image
(reference: kraken/contrib/recognition_boxes.py).
"""
import click


@click.command()
@click.option('-m', '--model', type=click.Path(exists=True), required=True)
@click.option('--suffix', default='.boxes.png')
@click.argument('files', nargs=-1, type=click.Path(exists=True))
def cli(model, suffix, files):
    from PIL import Image, ImageDraw
    from kraken_tpu.configs import (RecognitionInferenceConfig,
                                    SegmentationInferenceConfig)
    from kraken_tpu.pageseg import segment
    from kraken_tpu.tasks import RecognitionTaskModel

    task = RecognitionTaskModel.load_model(model)
    for fname in files:
        im = Image.open(fname)
        seg = segment(im.convert('L'))
        records = task.predict(im, seg, RecognitionInferenceConfig())
        canvas = im.convert('RGB')
        draw = ImageDraw.Draw(canvas, 'RGBA')
        for record in records:
            for cut, conf in zip(record.cuts, record.confidences):
                color = (int(255 * (1 - conf)), int(255 * conf), 0, 160)
                draw.polygon([tuple(p) for p in cut], outline=color)
        out = fname + suffix
        canvas.save(out)
        click.echo(f'Wrote {out}')


if __name__ == '__main__':
    cli()
