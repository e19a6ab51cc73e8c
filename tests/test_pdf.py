# -*- coding: utf-8 -*-
"""
Tests for the dependency-free scanned-PDF page extractor
(kraken_tpu/lib/pdf.py).

Fixture PDFs are built by hand below (classic xref tables, xref streams +
object streams, the filter/colourspace matrix) so the parser is exercised
against documents whose layout we control byte-for-byte — mirroring how
the reference gates its PDF path on a rasterizer backend
(/root/reference/kraken/kraken.py:363-399) which this module replaces for
scanned documents.
"""
import io
import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from kraken_tpu.lib.pdf import PDFError, extract_page_images, page_count


# ---------------------------------------------------------------- builders

def _obj(num, body: bytes) -> bytes:
    return f'{num} 0 obj\n'.encode() + body + b'\nendobj\n'


def _stream_obj(num, d: str, data: bytes) -> bytes:
    body = (f'<< {d} /Length {len(data)} >>\n'.encode()
            + b'stream\n' + data + b'\nendstream')
    return _obj(num, body)


def _image_obj(num, data, w, h, cs='/DeviceRGB', bpc=8, filt=None, parms=None,
               extra=''):
    d = (f'/Type /XObject /Subtype /Image /Width {w} /Height {h} '
         f'/ColorSpace {cs} /BitsPerComponent {bpc}')
    if filt:
        d += f' /Filter /{filt}'
    if parms:
        d += f' /DecodeParms {parms}'
    if extra:
        d += ' ' + extra
    return _stream_obj(num, d, data)


def _page_obj(num, parent, img_ref=None, rotate=0, extra=''):
    res = f'/Resources << /XObject << /Im0 {img_ref} 0 R >> >>' if img_ref else '/Resources << >>'
    rot = f' /Rotate {rotate}' if rotate else ''
    return _obj(num, (f'<< /Type /Page /Parent {parent} 0 R '
                      f'/MediaBox [0 0 612 792] {res}{rot} {extra}>>').encode())


def _assemble_classic(objects, trailer_extra=''):
    """objects: dict num -> full object bytes. Returns a classic-xref PDF."""
    out = bytearray(b'%PDF-1.4\n%\xe2\xe3\xcf\xd3\n')
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_at = len(out)
    maxnum = max(objects)
    out += f'xref\n0 {maxnum + 1}\n'.encode()
    out += b'0000000000 65535 f \n'
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += f'{offsets[num]:010d} 00000 n \n'.encode()
        else:
            out += b'0000000000 65535 f \n'
    out += (f'trailer\n<< /Size {maxnum + 1} /Root 1 0 R {trailer_extra}>>\n'
            f'startxref\n{xref_at}\n%%EOF\n').encode()
    return bytes(out)


def _doc_skeleton(page_nums):
    kids = ' '.join(f'{n} 0 R' for n in page_nums)
    return {
        1: _obj(1, b'<< /Type /Catalog /Pages 2 0 R >>'),
        2: _obj(2, (f'<< /Type /Pages /Kids [{kids}] '
                    f'/Count {len(page_nums)} >>').encode()),
    }


def _rgb_gradient(w, h):
    a = np.zeros((h, w, 3), np.uint8)
    a[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    a[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    a[..., 2] = 93
    return Image.fromarray(a)


# ---------------------------------------------------------------- fixtures

def _classic_jpeg_pdf(tmp_path):
    im = _rgb_gradient(48, 32)
    buf = io.BytesIO()
    im.save(buf, format='JPEG', quality=95)
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, buf.getvalue(), 48, 32, filt='DCTDecode')
    p = tmp_path / 'jpeg.pdf'
    p.write_bytes(_assemble_classic(objs))
    return p, im


# ---------------------------------------------------------------- tests

def test_classic_xref_jpeg(tmp_path):
    p, im = _classic_jpeg_pdf(tmp_path)
    assert page_count(p) == 1
    pages = list(extract_page_images(p))
    assert len(pages) == 1
    got = np.asarray(pages[0], np.int16)
    want = np.asarray(im, np.int16)
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 3  # JPEG round trip


def test_flate_rgb_and_gray_multipage_with_rotate(tmp_path):
    im_rgb = _rgb_gradient(40, 24)
    rgb_raw = zlib.compress(np.asarray(im_rgb).tobytes())
    # 1-bit checkerboard, width 37 → row padding to byte boundary
    bits = (np.indices((19, 37)).sum(0) % 2).astype(np.uint8)
    im_1 = Image.fromarray(bits * 255).convert('1')
    raw_1 = zlib.compress(np.packbits(bits, axis=1).tobytes())
    objs = _doc_skeleton([3, 5])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, rgb_raw, 40, 24, filt='FlateDecode')
    objs[5] = _page_obj(5, 2, img_ref=6, rotate=90)
    objs[6] = _image_obj(6, raw_1, 37, 19, cs='/DeviceGray', bpc=1,
                         filt='FlateDecode')
    p = tmp_path / 'flate.pdf'
    p.write_bytes(_assemble_classic(objs))
    pages = list(extract_page_images(p))
    assert len(pages) == 2
    assert np.array_equal(np.asarray(pages[0]), np.asarray(im_rgb))
    # page 2 carries /Rotate 90 → image comes back rotated
    assert pages[1].size == (19, 37)
    assert np.array_equal(np.asarray(pages[1]),
                          np.asarray(im_1.transpose(Image.Transpose.ROTATE_270)))


def test_flate_png_predictor(tmp_path):
    im = _rgb_gradient(33, 17)
    raw = np.asarray(im)
    # PNG Up-predictor encoding, filter byte 2 per row
    enc = bytearray()
    prev = np.zeros((33 * 3,), np.uint8)
    for r in range(17):
        row = raw[r].reshape(-1)
        enc.append(2)
        enc += ((row.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes()
        prev = row
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, zlib.compress(bytes(enc)), 33, 17,
                         filt='FlateDecode',
                         parms='<< /Predictor 15 /Colors 3 /Columns 33 >>')
    p = tmp_path / 'pred.pdf'
    p.write_bytes(_assemble_classic(objs))
    pages = list(extract_page_images(p))
    assert np.array_equal(np.asarray(pages[0]), raw)


def test_ccitt_g4(tmp_path):
    # encode a bilevel image as G4 via Pillow, lift the raw strip out of
    # the TIFF container, and embed it as a CCITTFaxDecode image
    bits = np.zeros((40, 64), np.uint8)
    bits[8:30, 10:50] = 1
    bits[12:26, 20:40] = 0
    im = Image.fromarray((1 - bits) * 255).convert('1')  # 1 = ink = black
    tb = io.BytesIO()
    im.save(tb, format='TIFF', compression='group4')
    strip, photometric = _tiff_strip(tb.getvalue())
    # TIFF WhiteIsZero (photometric 0): decoded black runs are 1 bits —
    # in PDF terms that is BlackIs1 = true
    black_is_1 = 'true' if photometric == 0 else 'false'
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, strip, 64, 40, cs='/DeviceGray', bpc=1,
                         filt='CCITTFaxDecode',
                         parms=f'<< /K -1 /Columns 64 /Rows 40 '
                               f'/BlackIs1 {black_is_1} >>')
    p = tmp_path / 'g4.pdf'
    p.write_bytes(_assemble_classic(objs))
    pages = list(extract_page_images(p))
    assert np.array_equal(np.asarray(pages[0].convert('1')), np.asarray(im))


def _tiff_strip(tiff: bytes):
    """Extracts (strip bytes, photometric) from a single-strip little-endian TIFF."""
    assert tiff[:4] == b'II*\x00'
    ifd_off = struct.unpack('<I', tiff[4:8])[0]
    n = struct.unpack('<H', tiff[ifd_off:ifd_off + 2])[0]
    tags = {}
    for i in range(n):
        t = tiff[ifd_off + 2 + 12 * i:ifd_off + 14 + 12 * i]
        tag, typ, cnt, val = struct.unpack('<HHII', t)
        if typ == 3:
            val &= 0xffff
        tags[tag] = val
    off, size = tags[273], tags[279]
    return tiff[off:off + size], tags.get(262, 0)


def test_xref_stream_and_objstm(tmp_path):
    """PDF 1.5 layout: document objects in an ObjStm, xref as a stream."""
    im = _rgb_gradient(20, 12)
    img_data = zlib.compress(np.asarray(im).tobytes())

    # objects 1-3 (catalog, pages, page) live inside object stream 5
    inner = [
        (1, b'<< /Type /Catalog /Pages 2 0 R >>'),
        (2, b'<< /Type /Pages /Kids [3 0 R] /Count 1 >>'),
        (3, b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
            b'/Resources << /XObject << /Im0 4 0 R >> >> >>'),
    ]
    header = ' '.join(f'{num} {off}' for num, off in
                      zip([n for n, _ in inner],
                          np.cumsum([0] + [len(b) + 1 for _, b in inner[:-1]]))).encode()
    payload = b' '.join(b for _, b in inner)
    first = len(header) + 1
    objstm_data = zlib.compress(header + b'\n' + payload)

    out = bytearray(b'%PDF-1.5\n%\xe2\xe3\xcf\xd3\n')
    offsets = {}
    img = _image_obj(4, img_data, 20, 12, filt='FlateDecode')
    offsets[4] = len(out)
    out += img
    objstm = _stream_obj(5, f'/Type /ObjStm /N {len(inner)} /First {first} '
                            '/Filter /FlateDecode', objstm_data)
    offsets[5] = len(out)
    out += objstm

    # xref stream object 6: W [1 2 2]
    rows = []
    rows.append(bytes([0]) + struct.pack('>H', 0) + struct.pack('>H', 65535))  # obj 0 free
    for num in (1, 2, 3):
        rows.append(bytes([2]) + struct.pack('>H', 5) + struct.pack('>H', num - 1))
    for num in (4, 5):
        rows.append(bytes([1]) + struct.pack('>H', offsets[num]) + struct.pack('>H', 0))
    xref_at = len(out)
    rows.append(bytes([1]) + struct.pack('>H', xref_at) + struct.pack('>H', 0))  # obj 6
    xdata = zlib.compress(b''.join(rows))
    out += _stream_obj(6, '/Type /XRef /Size 7 /W [1 2 2] /Index [0 7] '
                          '/Root 1 0 R /Filter /FlateDecode', xdata)
    out += f'startxref\n{xref_at}\n%%EOF\n'.encode()

    p = tmp_path / 'xstream.pdf'
    p.write_bytes(bytes(out))
    assert page_count(p) == 1
    pages = list(extract_page_images(p))
    assert np.array_equal(np.asarray(pages[0]), np.asarray(im))


def test_incremental_update_prev_chain(tmp_path):
    """An appended update adds page 2; /Prev must pull in the old xref."""
    im1 = _rgb_gradient(16, 10)
    im2 = _rgb_gradient(24, 14)
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, zlib.compress(np.asarray(im1).tobytes()), 16, 10,
                         filt='FlateDecode')
    base = _assemble_classic(objs)
    first_xref = int(base.rsplit(b'startxref\n', 1)[1].split(b'\n', 1)[0])

    out = bytearray(base)
    add = {
        2: _obj(2, b'<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>'),
        5: _page_obj(5, 2, img_ref=6),
        6: _image_obj(6, zlib.compress(np.asarray(im2).tobytes()), 24, 14,
                      filt='FlateDecode'),
    }
    offsets = {}
    for num in sorted(add):
        offsets[num] = len(out)
        out += add[num]
    xref_at = len(out)
    out += b'xref\n'
    out += b'2 1\n' + f'{offsets[2]:010d} 00000 n \n'.encode()
    out += b'5 2\n'
    out += f'{offsets[5]:010d} 00000 n \n'.encode()
    out += f'{offsets[6]:010d} 00000 n \n'.encode()
    out += (f'trailer\n<< /Size 7 /Root 1 0 R /Prev {first_xref} >>\n'
            f'startxref\n{xref_at}\n%%EOF\n').encode()
    p = tmp_path / 'incr.pdf'
    p.write_bytes(bytes(out))
    pages = list(extract_page_images(p))
    assert len(pages) == 2
    assert np.array_equal(np.asarray(pages[0]), np.asarray(im1))
    assert np.array_equal(np.asarray(pages[1]), np.asarray(im2))


def test_indexed_palette_and_lzw_roundtrip(tmp_path):
    # Indexed colour space with a hex-string palette, ASCIIHex outer filter
    idx = (np.indices((9, 13)).sum(0) % 4).astype(np.uint8)
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128])
    data = idx.tobytes().hex().encode() + b'>'
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, data, 13, 9,
                         cs=f'[/Indexed /DeviceRGB 3 <{palette.hex()}>]',
                         bpc=8, filt='ASCIIHexDecode')
    p = tmp_path / 'indexed.pdf'
    p.write_bytes(_assemble_classic(objs))
    pages = list(extract_page_images(p))
    want = np.array([list(palette[3 * v:3 * v + 3]) for v in idx.reshape(-1)],
                    np.uint8).reshape(9, 13, 3)
    assert np.array_equal(np.asarray(pages[0]), want)


def test_lzw_decode_filter():
    from kraken_tpu.lib.pdf import _lzw_decode
    # canonical PDF-spec example stream (ISO 32000-1 §7.4.4, example data
    # re-derived by hand): encode via a tiny LZW encoder, decode back
    def lzw_encode(data):
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out, acc, nbits = [], 0, 0

        def emit(code, w):
            nonlocal acc, nbits
            acc = (acc << w) | code
            nbits += w
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xff)
                nbits -= 8
        emit(256, width)
        w = b''
        for c in data:
            wc = w + bytes([c])
            if wc in table:
                w = wc
            else:
                emit(table[w], width)
                table[wc] = next_code
                next_code += 1
                # encoder-side EarlyChange point matching the decoder's
                # one-behind table (cross-checked against libtiff below)
                if next_code >= (1 << width) and width < 12:
                    width += 1
                w = bytes([c])
        if w:
            emit(table[w], width)
        emit(257, width)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xff)
        return bytes(out)

    payload = (b'-----A---B-----A---B' * 37 + bytes(range(256))) * 8
    assert _lzw_decode(lzw_encode(payload)) == payload


def test_lzw_decode_against_libtiff():
    """Decode a libtiff-encoded LZW strip (real-world encoder, EarlyChange)."""
    from kraken_tpu.lib.pdf import _lzw_decode
    rng = np.random.default_rng(0)
    a = (rng.integers(0, 4, (64, 256)) * 80).astype(np.uint8)
    tb = io.BytesIO()
    Image.fromarray(a, 'L').save(tb, format='TIFF', compression='tiff_lzw')
    t = tb.getvalue()
    ifd = struct.unpack('<I', t[4:8])[0]
    n = struct.unpack('<H', t[ifd:ifd + 2])[0]
    tags = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack('<HHII', t[ifd + 2 + 12 * i:ifd + 14 + 12 * i])
        tags[tag] = (typ, cnt, val)
    assert tags[259][2] == 5  # LZW

    def vals(tag):
        typ, cnt, val = tags[tag]
        if cnt == 1:
            return [val]
        sz, fmt = {3: (2, '<H'), 4: (4, '<I')}[typ]
        return [struct.unpack(fmt, t[val + i * sz:val + (i + 1) * sz])[0]
                for i in range(cnt)]
    dec = b''.join(_lzw_decode(t[o:o + c])
                   for o, c in zip(vals(273), vals(279)))
    assert dec == a.tobytes()


def test_no_image_page_raises(tmp_path):
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=None)
    p = tmp_path / 'vector.pdf'
    p.write_bytes(_assemble_classic(objs))
    with pytest.raises(PDFError, match='born-digital'):
        list(extract_page_images(p))


def test_encrypted_raises(tmp_path):
    objs = _doc_skeleton([3])
    objs[3] = _page_obj(3, 2, img_ref=None)
    objs[7] = _obj(7, b'<< /Filter /Standard /V 2 >>')
    p = tmp_path / 'enc.pdf'
    p.write_bytes(_assemble_classic(objs, trailer_extra='/Encrypt 7 0 R '))
    with pytest.raises(PDFError, match='encrypted'):
        page_count(p)


def test_not_a_pdf(tmp_path):
    p = tmp_path / 'x.pdf'
    p.write_bytes(b'GIF89a not a pdf')
    with pytest.raises(PDFError, match='not a PDF'):
        page_count(p)


def test_damaged_xref_recovers_by_scanning(tmp_path):
    p, im = _classic_jpeg_pdf(tmp_path)
    buf = bytearray(p.read_bytes())
    # corrupt the startxref offset
    at = buf.rfind(b'startxref')
    buf[at + 10:at + 12] = b'99'
    p2 = tmp_path / 'damaged.pdf'
    p2.write_bytes(bytes(buf))
    pages = list(extract_page_images(p2))
    assert len(pages) == 1
    assert pages[0].size == (48, 32)


def test_largest_image_selected_and_form_recursion(tmp_path):
    """A page with a small logo and the scan inside a Form XObject."""
    scan = _rgb_gradient(60, 44)
    logo = _rgb_gradient(8, 8)
    objs = _doc_skeleton([3])
    objs[3] = _obj(3, b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
                      b'/Resources << /XObject << /Logo 4 0 R /Fm 5 0 R >> >> >>')
    objs[4] = _image_obj(4, zlib.compress(np.asarray(logo).tobytes()), 8, 8,
                         filt='FlateDecode')
    objs[5] = _stream_obj(5, '/Type /XObject /Subtype /Form '
                             '/BBox [0 0 612 792] '
                             '/Resources << /XObject << /Im 6 0 R >> >>', b'')
    objs[6] = _image_obj(6, zlib.compress(np.asarray(scan).tobytes()), 60, 44,
                         filt='FlateDecode')
    p = tmp_path / 'form.pdf'
    p.write_bytes(_assemble_classic(objs))
    pages = list(extract_page_images(p))
    assert np.array_equal(np.asarray(pages[0]), np.asarray(scan))


def test_cli_pdf_input(tmp_path):
    """kraken -f pdf runs the binarize stage over extracted pages."""
    from click.testing import CliRunner
    from kraken_tpu.kraken import cli
    p, _ = _classic_jpeg_pdf(tmp_path)
    runner = CliRunner()
    with runner.isolated_filesystem(temp_dir=tmp_path) as fs:
        result = runner.invoke(cli, ['-f', 'pdf', '-i', str(p), 'out.png',
                                     '-o', '.png', '-p', 'page_{idx:06d}',
                                     'binarize'],
                               catch_exceptions=False)
        assert result.exit_code == 0, result.output
        import glob as _glob
        import os
        produced = _glob.glob(os.path.join(fs, '**', '*.png'), recursive=True)
        assert produced, result.output


def test_lazy_extraction_matches_eager(tmp_path):
    """extract_page_images_lazy yields one thunk per page without decoding;
    calling the thunks (in any order) reproduces the eager extractor —
    the shape kraken_tpu.pipeline.process_pages consumes so page decoding
    runs in its prefetch pool."""
    from kraken_tpu.lib.pdf import extract_page_images_lazy
    im_rgb = _rgb_gradient(40, 24)
    rgb_raw = zlib.compress(np.asarray(im_rgb).tobytes())
    objs = _doc_skeleton([3, 5])
    objs[3] = _page_obj(3, 2, img_ref=4)
    objs[4] = _image_obj(4, rgb_raw, 40, 24, filt='FlateDecode')
    objs[5] = _page_obj(5, 2, img_ref=4)
    p = tmp_path / 'lazy.pdf'
    p.write_bytes(_assemble_classic(objs))
    thunks = list(extract_page_images_lazy(p))
    assert len(thunks) == 2
    assert all(callable(t) for t in thunks)
    eager = list(extract_page_images(p))
    for t, e in zip(reversed(thunks), reversed(eager)):
        assert np.array_equal(np.asarray(t()), np.asarray(e))
