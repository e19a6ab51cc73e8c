#!/usr/bin/env python
"""
Regenerates merged Unicode script ranges as JSON, for per-script error
attribution in test reports.

Reference parity: kraken/contrib/generate_scripts.py (behavioral — the
reference fetches Scripts.txt over HTTP; this derives ranges offline from
the interpreter's own Unicode character database so it works without
network access; pass --scripts-txt to parse a downloaded Scripts.txt
instead).
"""
import json
import re
import sys
import unicodedata

import click

_RANGE_RE = re.compile(
    r'^(?P<start>[0-9A-F]{4,6})(\.\.(?P<end>[0-9A-F]{4,6}))?\s*;\s*(?P<name>\w+)')


def _merge(entries):
    """Coalesces adjacent (start, end, name) runs sharing a script name."""
    merged = []
    for start, end, name in entries:
        if merged and merged[-1][2] == name and start <= (merged[-1][1] or merged[-1][0]) + 1:
            merged[-1] = (merged[-1][0], end if end != start else merged[-1][1] or start, name)
        else:
            merged.append((start, end if end != start else None, name))
    return merged


def _from_scripts_txt(fp):
    entries = []
    for line in fp:
        m = _RANGE_RE.match(line)
        if m:
            start = int(m.group('start'), 16)
            end = int(m.group('end'), 16) if m.group('end') else start
            entries.append((start, end, m.group('name')))
    entries.sort()
    return entries


def _from_unicodedata():
    """
    Approximates script runs from character names: the leading words of a
    character's name (up to the first token that isn't shared with its
    neighbours) act as the script key.
    """
    from kraken_tpu.dataset.utils import _get_script
    entries = []
    run_start = None
    run_script = None
    prev = None
    for cp in range(sys.maxunicode + 1):
        ch = chr(cp)
        try:
            unicodedata.name(ch)
        except ValueError:
            script = None
        else:
            script = _get_script(ch)
        if script != run_script:
            if run_script is not None:
                entries.append((run_start, prev, run_script))
            run_start, run_script = cp, script
        prev = cp
    if run_script is not None:
        entries.append((run_start, prev, run_script))
    return [(s, e, n) for s, e, n in entries if n and n not in ('Common', 'Unknown')]


@click.command()
@click.option('--scripts-txt', type=click.File('r'), default=None,
              help='Parse an already-downloaded UCD Scripts.txt instead of '
                   'deriving ranges from unicodedata.')
@click.option('-o', '--output', type=click.File('w'), default='scripts.json')
def cli(scripts_txt, output):
    entries = _from_scripts_txt(scripts_txt) if scripts_txt else _from_unicodedata()
    json.dump(_merge(entries), output)
    click.echo(f'{len(entries)} ranges written', err=True)


if __name__ == '__main__':
    cli()
