"""Pure-Python codec for uncompressed audio (WAV — RIFF / 16-bit PCM).

The audio counterpart of functions/imaging.py: this container ships no
audio library, but PCM WAV needs none — the payload is a RIFF chunk list
with an `fmt ` descriptor and a `data` chunk of raw little-endian 16-bit
samples. The codec makes the decode step REAL — chunk walking, format
validation, interleaved-channel unpacking; compressed codecs (MP3/AAC/...)
fall through to the documented codec-boundary stub in
operators/multimodal.py.

All functions use explicit (sample_rate, n_channels, samples) tuples —
`samples` is the interleaved little-endian int16 byte string
(len == n_frames * n_channels * 2) in channel-interleaved frame order.
"""

from __future__ import annotations

import struct


class AudioFormatError(ValueError):
    """Payload is not a decodable WAV of the claimed format."""


def encode_wav(sample_rate: int, n_channels: int, samples: bytes) -> bytes:
    """RIFF/WAVE container around interleaved 16-bit PCM sample bytes."""
    if len(samples) % (2 * n_channels) != 0:
        raise AudioFormatError(
            f"sample buffer is {len(samples)} bytes — not a whole number of "
            f"{n_channels}-channel 16-bit frames"
        )
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )  # PCM
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, bytes]:
    """(sample_rate, n_channels, samples) from a RIFF/WAVE payload.

    Walks the chunk list properly — unknown chunks (LIST, cue, bext, ...)
    are skipped with word alignment, so payloads from real encoders that
    interleave metadata still decode. Only uncompressed 16-bit PCM
    (audio_format == 1, bits == 16) is accepted."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = n_channels = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > len(data):
            raise AudioFormatError(
                f"chunk {cid!r} declares {size} bytes but the payload ends "
                f"{pos + 8 + size - len(data)} bytes short — truncated file"
            )
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise AudioFormatError("fmt chunk too short")
            audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_format != 1 or bits != 16:
                raise AudioFormatError(
                    f"unsupported encoding (format={audio_format}, bits={bits}) "
                    "— only 16-bit PCM decodes here"
                )
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if sample_rate is None or samples is None:
        raise AudioFormatError("missing fmt or data chunk")
    if len(samples) % (2 * n_channels) != 0:
        raise AudioFormatError("data chunk is not whole 16-bit frames")
    return sample_rate, n_channels, samples


def samples_to_ints(samples: bytes) -> list[int]:
    """Interleaved int16 values from the raw sample byte string."""
    return list(struct.unpack(f"<{len(samples) // 2}h", samples))


def sniff_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"
