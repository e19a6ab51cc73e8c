"""
Codec tests: semantics parity with the reference codec
(/root/reference/kraken/lib/codec.py, tests/test_codec.py).
"""
import numpy as np
import pytest

from kraken_tpu.codec import Codec
from kraken_tpu.exceptions import KrakenCodecException, KrakenEncodeException

VALID = 'aaababbaaabbbb'
INVALID = 'aaababbcaaa'
INVALID_LABELS = [(45, 78, 778, 0.37), (10, 203, 859, 0.94), (11, 70, 601, 0.78),
                  (12, 251, 831, 0.72), (900, 72, 950, 0.27)]


@pytest.fixture
def o2o():
    return Codec('ab')


@pytest.fixture
def m2o():
    return Codec(['aaa', 'aa', 'a', 'b'])


@pytest.fixture
def o2m():
    return Codec({'a': [10, 11, 12], 'b': [12, 45, 80]})


@pytest.fixture
def m2m():
    return Codec({'aaa': [10, 11, 12], 'aa': [9, 9], 'a': [11], 'bb': [15], 'b': [12]})


def test_duplicate_charset_entries():
    with pytest.raises(KrakenCodecException):
        Codec('aab')


def test_non_prefix_free_rejected():
    # label sequence (1,) is a prefix of (1, 2)
    with pytest.raises(KrakenCodecException):
        Codec({'a': [1], 'b': [1, 2]})


def test_non_singular_rejected():
    with pytest.raises(KrakenCodecException):
        Codec({'a': [1], 'b': [1]})


def test_o2o_encode(o2o):
    np.testing.assert_array_equal(o2o.encode(VALID),
                                  [1, 1, 1, 2, 1, 2, 2, 1, 1, 1, 2, 2, 2, 2])


def test_m2o_encode(m2o):
    np.testing.assert_array_equal(m2o.encode(VALID),
                                  [3, 4, 1, 4, 4, 3, 4, 4, 4, 4])


def test_m2m_encode(m2m):
    np.testing.assert_array_equal(m2m.encode(VALID),
                                  [10, 11, 12, 12, 11, 15, 10, 11, 12, 15, 15])


def test_o2m_encode(o2m):
    np.testing.assert_array_equal(o2m.encode('ab'), [10, 11, 12, 12, 45, 80])


def test_o2o_decode(o2o):
    labels = [(1, 0, 10, 0.9), (2, 10, 20, 0.8), (1, 20, 30, 0.7)]
    assert ''.join(x[0] for x in o2o.decode(labels)) == 'aba'


def test_m2o_decode(m2o):
    labels = [(3, 0, 10, 0.9), (4, 10, 20, 0.8)]
    assert ''.join(x[0] for x in m2o.decode(labels)) == 'aaab'


def test_o2m_decode_aggregation(o2m):
    # multi-label code point: start of first, end of last, mean confidence
    labels = [(10, 5, 10, 0.6), (11, 10, 20, 0.9), (12, 20, 30, 0.3)]
    dec = o2m.decode(labels)
    assert dec == [('a', 5, 30, pytest.approx(0.6))]


def test_m2m_decode(m2m):
    labels = [(10, 0, 1, 0.9), (11, 1, 2, 0.9), (12, 2, 3, 0.02),
              (12, 3, 4, 0.5), (15, 4, 5, 0.6)]
    assert ''.join(x[0] for x in m2m.decode(labels)) == 'aaabbb'


def test_decode_invalid_nonstrict(o2o, m2o, o2m, m2m):
    assert o2o.decode(INVALID_LABELS) == []
    assert m2o.decode(INVALID_LABELS) == []
    # o2m decodes the (10, 11, 12) run in the middle as one 'a'
    dec = o2m.decode(INVALID_LABELS)
    assert [x[0] for x in dec] == ['a']
    assert dec[0][1] == 203 and dec[0][2] == 831
    dec = m2m.decode(INVALID_LABELS)
    assert [x[0] for x in dec] == ['a', 'a', 'a']


def test_encode_invalid_nonstrict(o2o, m2o, o2m, m2m):
    np.testing.assert_array_equal(o2o.encode(INVALID), [1, 1, 1, 2, 1, 2, 2, 1, 1, 1])
    np.testing.assert_array_equal(m2o.encode(INVALID), [3, 4, 1, 4, 4, 3])
    np.testing.assert_array_equal(m2m.encode(INVALID), [10, 11, 12, 12, 11, 15, 10, 11, 12])


def test_encode_decode_strict_raise():
    strict_o2o = Codec('ab', strict=True)
    with pytest.raises(KrakenEncodeException):
        strict_o2o.encode(INVALID)
    with pytest.raises(KrakenEncodeException):
        strict_o2o.decode(INVALID_LABELS)


def test_add_labels_string(o2o):
    c = o2o.add_labels('cde')
    assert len(c) == len(o2o) + 3
    np.testing.assert_array_equal(c.encode('cdaabae'), [3, 4, 1, 1, 2, 1, 5])


def test_add_labels_list(o2o):
    c = o2o.add_labels(['cd', 'e'])
    assert len(c) == len(o2o) + 2
    np.testing.assert_array_equal(c.encode('cdaabae'), [3, 1, 1, 2, 1, 4])


def test_add_labels_dict(o2o):
    c = o2o.add_labels({'cd': [3], 'e': [4]})
    assert len(c) == len(o2o) + 2
    np.testing.assert_array_equal(c.encode('cdaabae'), [3, 1, 1, 2, 1, 4])


def test_merge_both(o2o):
    new_codec, del_labels = o2o.merge(Codec('acde'))
    assert del_labels == {2}
    assert new_codec.c2l == {'a': [1], 'c': [2], 'd': [3], 'e': [4]}


def test_merge_add(o2o):
    new_codec, del_labels = o2o.merge(Codec('abcde'))
    assert del_labels == set()
    assert new_codec.c2l == {'a': [1], 'b': [2], 'c': [3], 'd': [4], 'e': [5]}


def test_merge_remove(o2o):
    new_codec, del_labels = o2o.merge(Codec('a'))
    assert del_labels == {2}
    assert new_codec.c2l == {'a': [1]}


def test_max_label(m2m):
    assert m2m.max_label == 15


# -- strict-mode permutations per codec shape (the reference's 8-case
#    matrix, tests/test_codec.py:233-288) --

@pytest.fixture
def strict_variants():
    return [Codec('ab', strict=True),
            Codec(['aaa', 'aa', 'a', 'b'], strict=True),
            Codec({'a': [10, 11, 12], 'b': [12, 45, 80]}, strict=True),
            Codec({'aaa': [10, 11, 12], 'aa': [9, 9], 'a': [11],
                   'bb': [15], 'b': [12]}, strict=True)]


def test_strict_encode_raises_all_shapes(strict_variants):
    for c in strict_variants:
        with pytest.raises(KrakenEncodeException):
            c.encode(INVALID)


def test_strict_decode_raises_all_shapes(strict_variants):
    for c in strict_variants:
        with pytest.raises(KrakenEncodeException):
            c.decode(INVALID_LABELS)


def test_strict_valid_sequences_still_work(strict_variants):
    for c in strict_variants:
        enc = c.encode(VALID)
        labels = [(int(l), 10 * i, 10 * i + 10, 0.5) for i, l in enumerate(enc)]
        assert ''.join(x[0] for x in c.decode(labels)) in (VALID, 'aaabbbaaabbbb')


def test_o2m_encode_full(o2m):
    np.testing.assert_array_equal(
        o2m.encode(VALID),
        [10, 11, 12] * 3 + [12, 45, 80] + [10, 11, 12] + [12, 45, 80] * 2 +
        [10, 11, 12] * 3 + [12, 45, 80] * 4)


def test_o2m_encode_invalid_nonstrict(o2m):
    # encoding stops at the first unencodable character
    np.testing.assert_array_equal(
        o2m.encode(INVALID),
        [10, 11, 12] * 3 + [12, 45, 80] + [10, 11, 12] + [12, 45, 80] * 2 +
        [10, 11, 12] * 3)


def test_o2m_decode_invalid_aggregation(o2m):
    # the decodable (10, 11, 12) run must aggregate start-of-first,
    # end-of-last, mean confidence exactly
    dec = o2m.decode(INVALID_LABELS)
    assert len(dec) == 1
    char, start, end, conf = dec[0]
    assert (char, start, end) == ('a', 203, 831)
    assert conf == pytest.approx((0.94 + 0.78 + 0.72) / 3)


def test_o2m_decode_roundtrip_aggregation(o2m):
    # full encode→decode round trip with synthetic cuts: every decoded
    # code point spans its labels' first start to last end
    enc = o2m.encode(VALID)
    labels = [(int(l), 7 * i, 7 * i + 5, 0.25) for i, l in enumerate(enc)]
    dec = o2m.decode(labels)
    assert ''.join(x[0] for x in dec) == VALID
    for char, start, end, conf in dec:
        assert end - start == 2 * 7 + 5  # three labels per code point
        assert conf == pytest.approx(0.25)


def test_m2m_decode_multilabel_match(m2m):
    # 'aa' maps to (9, 9): the matched pair decodes to one tuple per
    # produced code point, each spanning first-start..last-end with the
    # averaged confidence (reference decode, lib/codec.py:180-187)
    labels = [(9, 0, 5, 0.5), (9, 5, 10, 0.7)]
    dec = m2m.decode(labels)
    assert dec == [('a', 0, 10, pytest.approx(0.6)),
                   ('a', 0, 10, pytest.approx(0.6))]


def test_merge_m2m_shapes(m2m):
    # the reference merge algorithm (lib/codec.py:197-241) on compound
    # labels: 'aa'/[9,9], 'a'/[11], 'bb'/[15] are deletion candidates, but
    # label 11 stays in use inside 'aaa' so only {9, 15} are freed; the
    # hole at 9 is closed by decrementing, then 'c' gets the next free
    # label after the surviving maximum
    new_codec, del_labels = m2m.merge(Codec(['aaa', 'b', 'c']))
    assert del_labels == {9, 15}
    assert new_codec.c2l == {'aaa': [9, 10, 11], 'b': [11], 'c': [12]}
