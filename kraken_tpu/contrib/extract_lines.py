#!/usr/bin/env python
"""
Extracts (dewarped) line images + transcriptions from XML files or binary
datasets (reference: kraken/contrib/extract_lines.py).
"""
import click


@click.command()
@click.option('-f', '--format-type', type=click.Choice(['xml', 'alto', 'page', 'binary']),
              default='xml')
@click.option('-o', '--output', type=click.Path(), default='.')
@click.option('--legacy-polygons', is_flag=True, default=False)
@click.argument('files', nargs=-1, type=click.Path(exists=True))
def cli(format_type, output, legacy_polygons, files):
    import io
    import pathlib
    from PIL import Image

    out_dir = pathlib.Path(output)
    out_dir.mkdir(parents=True, exist_ok=True)
    idx = 0
    if format_type == 'binary':
        import pyarrow as pa
        for fname in files:
            with pa.memory_map(str(fname), 'rb') as source:
                table = pa.ipc.open_file(source).read_all()
            for row in range(len(table)):
                sample = table.column('lines')[row].as_py()
                Image.open(io.BytesIO(sample['im'])).save(out_dir / f'{idx}.png')
                (out_dir / f'{idx}.gt.txt').write_text(sample['text'], encoding='utf-8')
                idx += 1
    else:
        from kraken_tpu.lib.geometry import extract_polygons
        from kraken_tpu.lib.util import open_image
        from kraken_tpu.xml import XMLPage
        for fname in files:
            doc = XMLPage(fname, filetype=format_type)
            seg = doc.to_container()
            im = open_image(doc.imagename)
            for line_im, line in extract_polygons(im, seg, legacy=legacy_polygons):
                line_im.save(out_dir / f'{idx}.png')
                (out_dir / f'{idx}.gt.txt').write_text(line.text or '', encoding='utf-8')
                idx += 1
    click.echo(f'Extracted {idx} lines to {out_dir}')


if __name__ == '__main__':
    cli()
