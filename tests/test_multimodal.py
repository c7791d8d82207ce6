"""Real multimodal codecs: BMP/WAV roundtrips and rejection paths."""


def test_bmp_wav_codec_roundtrips_and_errors():
    """Real codecs: BMP (padding/BGR/bottom-up) and WAV (RIFF chunk walk)
    roundtrip bit-exact for assorted shapes; malformed payloads are
    rejected loudly rather than mis-decoded."""
    import numpy as np
    import pytest as _pytest

    from solr_spark.multimodal import (
        decode_bmp, decode_wav, encode_bmp, encode_wav,
    )

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (2, 7), (5, 3), (16, 16), (9, 13)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px), (h, w)

    for n, sr in [(0, 8000), (1, 16000), (333, 44100)]:
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        got_sr, got = decode_wav(encode_wav(s, sr))
        assert got_sr == sr and np.array_equal(got, s)

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG0" + b"\x00" * 60)
    with _pytest.raises(ValueError, match="unsupported BMP"):
        # 8bpp header
        px = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
        buf = bytearray(encode_bmp(px))
        buf[28] = 8
        decode_bmp(bytes(buf))
    with _pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFX" + b"\x00" * 40)
    with _pytest.raises(ValueError, match="no data chunk"):
        # 36 bytes = RIFF header + complete fmt chunk, data chunk dropped
        decode_wav(encode_wav(np.zeros(4, np.int16), 8000)[:36])
