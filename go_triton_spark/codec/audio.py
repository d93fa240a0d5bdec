"""Format-sniffing audio decode: one entry point for heterogeneous
binary audio columns — the audio twin of codec/image.py.

A real pipeline's audio column holds mixed containers; ``parse_audio``
sniffs the magic and routes to the real parser (RIFF/WAVE ->
codec/wav.py PCM, fLaC -> codec/flac.py Rice+LPC), normalizing to the
shared contract both emit: ``samples`` as an (n_frames, n_channels)
integer array plus ``sample_rate`` / ``n_samples`` / ``n_channels``
metadata, so downstream signal math is container-agnostic. Unknown
magic fails with the generic corrupt-skip ValueError, the same
contract as every parser in the codec family.
"""

from __future__ import annotations


def sniff_audio_format(data: bytes) -> str:
    """Return 'wav' | 'flac', or raise ValueError for unknown bytes."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    raise ValueError("unknown audio format (no recognized magic)")


def parse_audio(data: bytes) -> dict:
    """Decode one audio payload of any supported container.

    Always returns: samples (n_frames, n_channels) int array,
    sample_rate, n_samples, n_channels.
    """
    fmt = sniff_audio_format(data)
    if fmt == "wav":
        from go_triton_spark.codec.wav import parse_wav
        m = parse_wav(data)
        return {"samples": m["samples"], "sample_rate": m["sample_rate"],
                "n_samples": m["n_frames"], "n_channels": m["n_channels"]}
    from go_triton_spark.codec.flac import parse_flac
    m = parse_flac(data)
    return {"samples": m["samples"], "sample_rate": m["sample_rate"],
            "n_samples": m["n_samples"], "n_channels": m["n_channels"]}
