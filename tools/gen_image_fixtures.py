#!/usr/bin/env python3
"""Generate the round-14 image fixtures (committed under
src/main/resources/graft/images/) straight from the container specs —
python struct only, sharing no code with either parser under test
(graft HeaderCodec) or the JDK's ImageIO (graft PixelCodec).

The BMP/TIFF files carry REAL uncompressed pixel data with a documented
pixel matrix, so their per-channel means are hand-derivable rationals
(the independent oracle anchors for the pixel-decode gate):

  rgb_4x3.bmp      4x3 24-bit bottom-up BMP.  pixel(x,y) = (r,g,b) =
                   (10*(x+1), 20*(y+1), 5*(x+y))
                   means: r = 10*avg(x+1) = 25.0
                          g = 20*avg(y+1) = 40.0
                          b = 5*(avg(x)+avg(y)) = 5*(1.5+1.0) = 12.5
  topdown_5x4.bmp  5x4 24-bit TOP-DOWN BMP (negative biHeight — the
                   classic sign trap).  pixel(x,y) = (x*50, y*60, 200)
                   means: r = 50*2 = 100.0, g = 60*1.5 = 90.0, b = 200.0
  rgb_6x2.tif      6x2 uncompressed little-endian RGB TIFF.
                   pixel(x,y) = (x*40, y*100, 30)
                   means: r = 40*2.5 = 100.0, g = 100*0.5 = 50.0, b = 30.0

The WebP files are spec-built container headers (RFC 9649 / VP8 RFC 6386
frame header / VP8L bitstream spec) for the HEADER parsing path only —
no JDK WebP decoder exists, so no pixel data is needed:

  lossy_17x9.webp      RIFF + 'VP8 ' keyframe header, 17x9
  lossless_33x21.webp  RIFF + 'VP8L' signature bitstream, 33x21, no alpha
  alpha_12x5.webp      RIFF + 'VP8L' with the alpha bit set, 12x5
  extended_640x360.webp RIFF + 'VP8X' canvas header, 640x360, alpha flag

Deterministic output (no randomness): re-running must reproduce the
committed bytes exactly.  Usage: python3 tools/gen_image_fixtures.py
"""
import struct
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "images")


def bmp(width, height, pix, topdown=False):
    """24-bit uncompressed BMP (BITMAPINFOHEADER). pix(x,y) -> (r,g,b).
    Rows padded to 4 bytes; bottom-up unless topdown (negative biHeight)."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    rows = []
    ys = range(height) if topdown else range(height - 1, -1, -1)
    for y in ys:
        row = b"".join(bytes((pix(x, y)[2], pix(x, y)[1], pix(x, y)[0]))
                       for x in range(width))
        rows.append(row + b"\x00" * pad)
    data = b"".join(rows)
    bih = struct.pack("<IiiHHIIiiII", 40, width,
                      -height if topdown else height,
                      1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + 40
    bfh = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return bfh + bih + data


def tiff_rgb(width, height, pix, orientation=None):
    """Uncompressed little-endian RGB TIFF: header, one strip of raw
    RGBRGB... samples, then the IFD (entries sorted by tag per spec).
    `orientation` (EXIF/TIFF tag 274, values 1-8) is written when given —
    the rotated-duplicate fixture class carries 6 (rotate 90 CW to
    display)."""
    strip = b"".join(bytes(pix(x, y))
                     for y in range(height) for x in range(width))
    strip_off = 8
    ifd_off = strip_off + len(strip)
    bps_off = None  # BitsPerSample needs 3 SHORTs -> external value

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    # 10-11 entries, then external BitsPerSample array after the IFD
    n = 10 if orientation is None else 11
    bps_off = ifd_off + 2 + n * 12 + 4
    entries = [
        entry(256, 4, 1, struct.pack("<I", width)),          # ImageWidth
        entry(257, 4, 1, struct.pack("<I", height)),         # ImageLength
        entry(258, 3, 3, struct.pack("<I", bps_off)),        # BitsPerSample
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),          # Compression=none
        entry(262, 3, 1, struct.pack("<HH", 2, 0)),          # Photometric=RGB
        entry(273, 4, 1, struct.pack("<I", strip_off)),      # StripOffsets
    ] + ([entry(274, 3, 1, struct.pack("<HH", orientation, 0))]
         if orientation is not None else []) + [
        entry(277, 3, 1, struct.pack("<HH", 3, 0)),          # SamplesPerPixel
        entry(278, 4, 1, struct.pack("<I", height)),         # RowsPerStrip
        entry(279, 4, 1, struct.pack("<I", len(strip))),     # StripByteCounts
        entry(284, 3, 1, struct.pack("<HH", 1, 0)),          # PlanarConfig
    ]
    assert len(entries) == n
    ifd = struct.pack("<H", n) + b"".join(entries) + struct.pack("<I", 0)
    header = struct.pack("<2sHI", b"II", 42, ifd_off)
    return header + strip + ifd + struct.pack("<HHH", 8, 8, 8)


def riff_webp(chunk_tag, payload):
    chunk = chunk_tag + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_vp8(width, height):
    """'VP8 ' lossy keyframe header: 3-byte frame tag (keyframe bit 0),
    start code 9D 01 2A, then 16-bit LE width/height (14 bits + scale)."""
    frame_tag = b"\x10\x00\x00"  # keyframe, version 0, show_frame, partlen
    dims = struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
    return riff_webp(b"VP8 ", frame_tag + b"\x9d\x01\x2a" + dims +
                     b"\x00" * 8)


def webp_vp8l(width, height, alpha=False):
    """'VP8L' signature byte 0x2F then a 32-bit LE field: width-1 (14
    bits), height-1 (14 bits), alpha (1), version (3, must be 0)."""
    bits = (width - 1) | ((height - 1) << 14) | ((1 if alpha else 0) << 28)
    return riff_webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) +
                     b"\x00" * 4)


def webp_vp8x(width, height, alpha=False):
    """'VP8X' extended header: flags byte (bit4 = alpha), 3 reserved
    bytes, then 24-bit LE canvas width-1 / height-1."""
    flags = 0x10 if alpha else 0x00
    def le24(v):
        return struct.pack("<I", v)[:3]
    return riff_webp(b"VP8X", bytes((flags,)) + b"\x00" * 3 +
                     le24(width - 1) + le24(height - 1))


def wav_pcm16(sample_rate, channels, frames):
    """Canonical RIFF/WAVE PCM: 16-bit LE samples. `frames` is a list of
    per-frame tuples (one int16 per channel)."""
    data = b"".join(struct.pack("<h", s) for fr in frames for s in fr)
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mp4(width, height, timescale, duration, n_traks=1):
    """Minimal ISO-BMFF: ftyp + moov(mvhd + trak(tkhd)). Box sizes are
    32-bit BE; tkhd dims are 16.16 fixed point; mvhd v0 carries
    (timescale, duration) at fixed offsets."""
    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(b"mvhd", struct.pack(">B3x", 0) +        # version 0
               struct.pack(">II", 0, 0) +               # ctime, mtime
               struct.pack(">II", timescale, duration) +
               struct.pack(">I", 0x00010000) +          # rate 1.0
               struct.pack(">H", 0x0100) + b"\x00" * 10 +  # volume+rsv
               b"\x00" * 36 +                            # matrix-ish
               b"\x00" * 24 +                            # predefined
               struct.pack(">I", n_traks + 1))           # next track id
    traks = b""
    for i in range(n_traks):
        tkhd = box(b"tkhd", struct.pack(">B3x", 0) +
                   struct.pack(">II", 0, 0) +            # ctime, mtime
                   struct.pack(">I", i + 1) +            # track id
                   struct.pack(">I", 0) +                # reserved
                   struct.pack(">I", duration) +
                   b"\x00" * 8 +                         # reserved
                   struct.pack(">HH", 0, 0) +            # layer, group
                   struct.pack(">H", 0) + b"\x00" * 2 +  # volume + rsv
                   b"\x00" * 36 +                        # matrix
                   struct.pack(">II", width << 16, height << 16))
        traks += box(b"trak", tkhd)
    return ftyp + box(b"moov", mvhd + traks)


def mp4_tracks(timescale, duration, tracks, mdat=None):
    """ISO-BMFF with FULL track structure: moov(mvhd + per-track
    trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stsd + stsz + stco
    [+ stss][+ ctts]))))) [+ mdat].
    Each track dict: handler (b'vide'/b'soun'), codec fourcc, width,
    height, n_samples, chunk_offsets; optional sync_samples (stss
    1-based sample numbers) and ctts ((sample_count, offset) pairs,
    version 0). stsz uses a uniform sample size (256) so no per-sample
    table is needed; stsd carries one sample entry (VisualSampleEntry
    dims at entry offset 32/34). `mdat` bytes, when given, append a
    top-level mdat box after moov so frame-slice plumbing has payload
    to cut."""
    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ, payload):  # FullBox: version 0, flags 0
        return box(typ, b"\x00\x00\x00\x00" + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = full(b"mvhd",
                struct.pack(">II", 0, 0) +               # ctime, mtime
                struct.pack(">II", timescale, duration) +
                struct.pack(">I", 0x00010000) +
                struct.pack(">H", 0x0100) + b"\x00" * 10 +
                b"\x00" * 36 + b"\x00" * 24 +
                struct.pack(">I", len(tracks) + 1))
    traks = b""
    for i, t in enumerate(tracks):
        tkhd = full(b"tkhd",
                    struct.pack(">II", 0, 0) +
                    struct.pack(">I", i + 1) +           # track id
                    struct.pack(">I", 0) +
                    struct.pack(">I", duration) +
                    b"\x00" * 8 + struct.pack(">HH", 0, 0) +
                    struct.pack(">H", 0) + b"\x00" * 2 +
                    b"\x00" * 36 +
                    struct.pack(">II", t["width"] << 16,
                                t["height"] << 16))
        mdhd = full(b"mdhd", struct.pack(">II", 0, 0) +
                    struct.pack(">II", timescale, duration) +
                    struct.pack(">HH", 0x55C4, 0))
        hdlr = full(b"hdlr", struct.pack(">I", 0) + t["handler"] +
                    b"\x00" * 12 + b"trk\x00")
        if t["handler"] == b"vide":
            se_body = (b"\x00" * 6 + struct.pack(">H", 1) +
                       struct.pack(">HH", 0, 0) + b"\x00" * 12 +
                       struct.pack(">HH", t["width"], t["height"]) +
                       struct.pack(">II", 0x00480000, 0x00480000) +
                       struct.pack(">I", 0) + struct.pack(">H", 1) +
                       b"\x00" * 32 + struct.pack(">Hh", 24, -1))
        else:
            se_body = (b"\x00" * 6 + struct.pack(">H", 1) +
                       b"\x00" * 8 + struct.pack(">HH", 2, 16) +
                       struct.pack(">I", 0) +
                       struct.pack(">I", timescale << 16))
        stsd = full(b"stsd", struct.pack(">I", 1) + box(t["codec"], se_body))
        stsz = full(b"stsz", struct.pack(">II", 256, t["n_samples"]))
        stco = full(b"stco", struct.pack(">I", len(t["chunk_offsets"])) +
                    b"".join(struct.pack(">I", o)
                             for o in t["chunk_offsets"]))
        boxes = stsd + stsz + stco
        if "sync_samples" in t:
            boxes += full(b"stss",
                          struct.pack(">I", len(t["sync_samples"])) +
                          b"".join(struct.pack(">I", s)
                                   for s in t["sync_samples"]))
        if "ctts" in t:
            boxes += full(b"ctts", struct.pack(">I", len(t["ctts"])) +
                          b"".join(struct.pack(">II", c, o)
                                   for c, o in t["ctts"]))
        stbl = box(b"stbl", boxes)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    out = ftyp + box(b"moov", mvhd + traks)
    if mdat is not None:
        out += box(b"mdat", mdat)
    return out


def main():
    fixtures = {
        "rgb_4x3.bmp": bmp(4, 3,
                           lambda x, y: (10 * (x + 1), 20 * (y + 1),
                                         5 * (x + y))),
        "topdown_5x4.bmp": bmp(5, 4,
                               lambda x, y: (x * 50, y * 60, 200),
                               topdown=True),
        "rgb_6x2.tif": tiff_rgb(6, 2, lambda x, y: (x * 40, y * 100, 30)),
        # rot90_2x6.tif (r15): the ROTATED-DUPLICATE twin of rgb_6x2.tif.
        # Stored raster is 2x6 with S(a,b) = orig(5-b, a) and TIFF
        # Orientation 6 ("rotate 90 CW to display"): the displayed image
        # D(x,y) = S(y, 5-x) = orig(x, y) EXACTLY — lossless container, so
        # an orientation-normalizing perceptual hash must match the
        # original bit-for-bit (Hamming 0), while the raw stored raster
        # hashes differently. The transcoded-rotated-dup class.
        "rot90_2x6.tif": tiff_rgb(
            2, 6, lambda a, b: ((5 - b) * 40, a * 100, 30), orientation=6),
        "lossy_17x9.webp": webp_vp8(17, 9),
        "lossless_33x21.webp": webp_vp8l(33, 21),
        "alpha_12x5.webp": webp_vp8l(12, 5, alpha=True),
        "extended_640x360.webp": webp_vp8x(640, 360, alpha=True),
        # ---- audio (r14): PCM with HAND-DERIVABLE stats ----
        # square_8k_mono: 800 frames, period-8 square wave at ±8192.
        #   every |sample| = 8192 -> rms = 8192.0 exactly;
        #   sign flips at i = 4, 8, ..., 796 -> 199 zero crossings;
        #   peak = 8192; duration = 800/8000 s = 100 ms.
        "square_8k_mono.wav": wav_pcm16(8000, 1, [
            (8192 if (i // 4) % 2 == 0 else -8192,) for i in range(800)]),
        # ramp_stereo: 100 frames at 4000 Hz. ch0 = 20*i - 990
        #   (-990..990, one sign change -> 1 crossing); ch1 = 1000 const
        #   (0 crossings). sumsq = sum((20i-990)^2) + 100*1000^2
        #   = 33,330,000 + 100,000,000 = 133,330,000 over 200 samples
        #   (sum((20i-990)^2) = 200 * sum of odd squares 1..99 * 100
        #    = 200 * 166650 * ... = 2*100*166650 = 33,330,000)
        #   -> rms = sqrt(666650) = 816.4863746…; peak = 1000;
        #   duration = 100/4000 s = 25 ms.
        "ramp_stereo.wav": wav_pcm16(4000, 2, [
            (20 * i - 990, 1000) for i in range(100)]),
        # silence: all-zero samples; rms/zcr/peak = 0;
        #   duration = floor(50*1000/44100) = 1 ms.
        "silence_441_mono.wav": wav_pcm16(44100, 1, [(0,)] * 50),
        # ---- video headers (r14): ISO-BMFF with known mvhd/tkhd ----
        # timescale 1000, duration 7500 -> 7500 ms; one 640x360 track
        "clip_640x360.mp4": mp4(640, 360, 1000, 7500, n_traks=1),
        # timescale 600, duration 1200 -> 2000 ms; two 320x240 tracks
        "clip_2trak.mp4": mp4(320, 240, 600, 1200, n_traks=2),
        # clip_stbl.mp4 (r15): full sample-table depth — one avc1 video
        # track (320x180 sample-entry dims, 48 samples, 3 chunks) and
        # one mp4a audio track (96 samples, 4 chunks). timescale 1000,
        # duration 4000 -> 4000 ms.
        # clip_sync.mp4 (r17): stss + ctts depth — the avc1 track carries
        # 4 sync samples (1-based 1/13/25/37 of 48 -> keyframe share
        # 4/48) and a two-entry v0 ctts (24 samples at offset 0, 24 at
        # 512 -> max offset 512, the b-frame tell); the mp4a track has
        # neither box (all-sync per ISO 14496-12 -> honest NULLs). A
        # 1504-byte deterministic mdat (byte i = (i*7+13)%256) gives the
        # keyframe-slice plumbing real payload to cut.
        "clip_sync.mp4": mp4_tracks(1000, 6000, [
            {"handler": b"vide", "codec": b"avc1", "width": 320,
             "height": 180, "n_samples": 48,
             "chunk_offsets": [4096, 8192, 12288],
             "sync_samples": [1, 13, 25, 37],
             "ctts": [(24, 0), (24, 512)]},
            {"handler": b"soun", "codec": b"mp4a", "width": 0,
             "height": 0, "n_samples": 96,
             "chunk_offsets": [1024, 2048, 3072, 4000]},
        ], mdat=bytes((i * 7 + 13) % 256 for i in range(1504))),
        "clip_stbl.mp4": mp4_tracks(1000, 4000, [
            {"handler": b"vide", "codec": b"avc1", "width": 320,
             "height": 180, "n_samples": 48,
             "chunk_offsets": [4096, 8192, 12288]},
            {"handler": b"soun", "codec": b"mp4a", "width": 0,
             "height": 0, "n_samples": 96,
             "chunk_offsets": [1024, 2048, 3072, 4000]},
        ]),
    }
    os.makedirs(OUT, exist_ok=True)
    for name, data in fixtures.items():
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
