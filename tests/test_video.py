"""Video pipeline tests on synthetic raw .yuv clips (CPU, no ffmpeg)."""

import io
import os
import threading

import numpy as np
import pytest

from watermarking_gpu_tpu.io.config import Settings
from watermarking_gpu_tpu.io.matfile import save_watermark
from watermarking_gpu_tpu.video import (FrameReader, FrameWriter,
                                        detect_video, embed_video,
                                        frame_bytes, native_available,
                                        split_planes, synthesize)

W, H = 128, 96
N_FRAMES = 7
INTERVAL = 3


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    rng = np.random.default_rng(253)
    root = tmp_path_factory.mktemp("video")
    path = root / "clip.yuv"
    path.write_bytes(synthesize(W, H, N_FRAMES, seed=3))
    wm_path = root / "w.dat"
    save_watermark(wm_path, rng.normal(size=(H, W)).astype(np.float32))
    return root, str(path), str(wm_path)


def make_settings(root, clip_path, wm_path, **kw):
    s = Settings(video=clip_path, watermark=wm_path, p=3, psnr=30.0,
                 watermark_interval=INTERVAL,
                 raw_video_size=f"{W}x{H}", raw_video_fps=25.0)
    for k, v in kw.items():
        setattr(s, k, v)
    return s


@pytest.mark.parametrize("force_python", [True, False])
def test_frame_pump_roundtrip(tmp_path, force_python, rng):
    if not force_python and not native_available():
        pytest.skip("native pump not built")
    fb = frame_bytes(32, 16)
    frames = [rng.integers(0, 256, fb).astype(np.uint8) for _ in range(5)]
    path = tmp_path / "pump.yuv"
    with open(path, "wb") as f:
        writer = FrameWriter(f.fileno(), fb, force_python=force_python)
        for fr in frames:
            writer.put(fr)
        writer.close()
    with open(path, "rb") as f:
        reader = FrameReader(f.fileno(), fb, force_python=force_python)
        for fr in frames:
            got = reader.next()
            np.testing.assert_array_equal(got, fr)
        assert reader.next() is None
        reader.close()


@pytest.mark.parametrize("force_python", [True, False])
def test_frame_reader_bad_fd_fails_promptly(tmp_path, force_python):
    """A source fd whose read fails mid-stream must surface an error from
    next(), never hang. Regression (r4 VERDICT #1): the Python pump thread
    died on OSError WITHOUT enqueuing the EOF sentinel, so a consumer
    blocked in next()'s queue.get() waited forever. A directory fd makes
    os.read raise deterministically (EISDIR) without fd-reuse races."""
    if not force_python and not native_available():
        pytest.skip("native pump not built")
    fd = os.open(tmp_path, os.O_RDONLY)
    try:
        reader = FrameReader(fd, frame_bytes(32, 16),
                             force_python=force_python)
        result = []

        def consume():
            try:
                result.append(("ok", reader.next()))
            except IOError as exc:
                result.append(("err", exc))

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        t.join(timeout=10)
        assert not t.is_alive(), "consumer hung in next() after read error"
        assert result[0][0] == "err"
        if force_python:
            with pytest.raises(IOError):   # terminal: every later call too
                reader.next()
        reader.close()
    finally:
        os.close(fd)


def test_frame_reader_source_closed_while_blocked():
    """Closing the write end while a consumer blocks in next() (pump blocked
    in os.read on an open pipe) must deliver EOF promptly."""
    r, w = os.pipe()
    reader = FrameReader(r, frame_bytes(32, 16), force_python=True)
    result = []

    def consume():
        result.append(reader.next())

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    os.write(w, b"x" * 100)        # partial frame, then the source dies
    os.close(w)
    t.join(timeout=10)
    assert not t.is_alive(), "consumer hung in next() after source close"
    assert result == [None]
    assert reader.next() is None   # EOF is sticky, never blocks again
    reader.close()
    os.close(r)


def test_frame_writer_sink_death_never_blocks_put():
    """After the sink fd dies, put() must raise rather than block forever on
    a full queue (the dead pump thread can no longer drain it)."""
    r, w = os.pipe()
    fb = frame_bytes(32, 16)
    writer = FrameWriter(w, fb, depth=2, force_python=True)
    os.close(r)                    # writes now raise EPIPE in the pump
    frame = np.zeros(fb, dtype=np.uint8)
    with pytest.raises(IOError):
        for _ in range(64):        # must trip _error, not deadlock
            writer.put(frame)
    with pytest.raises(IOError):
        writer.close()
    os.close(w)


def test_embed_then_detect_video(clip):
    root, clip_path, wm_path = clip
    out_path = str(root / "marked.yuv")
    settings = make_settings(root, clip_path, wm_path,
                             encode_watermark_file_path=out_path)
    frames = embed_video(settings, out=io.StringIO())
    assert frames == N_FRAMES
    assert os.path.getsize(out_path) == N_FRAMES * frame_bytes(W, H)

    # chroma must pass through untouched; unsampled lumas too
    original = np.frombuffer(open(clip_path, "rb").read(), dtype=np.uint8)
    marked = np.frombuffer(open(out_path, "rb").read(), dtype=np.uint8)
    fb = frame_bytes(W, H)
    for i in range(N_FRAMES):
        orig_frame = original[i * fb:(i + 1) * fb]
        marked_frame = marked[i * fb:(i + 1) * fb]
        oy, ou, ov = split_planes(orig_frame, W, H)
        my, mu, mv = split_planes(marked_frame, W, H)
        np.testing.assert_array_equal(ou, mu)
        np.testing.assert_array_equal(ov, mv)
        if i % INTERVAL == 0:
            assert np.abs(oy.astype(int) - my.astype(int)).max() > 0
        else:
            np.testing.assert_array_equal(oy, my)

    # detection on the watermarked clip: sampled frames correlate strongly
    det = make_settings(root, out_path, wm_path, detect_batch=2)
    buf = io.StringIO()
    n, results = detect_video(det, out=buf)
    assert n == N_FRAMES
    ids = [fid for fid, _ in results]
    assert ids == [0, 3, 6]
    marked_corrs = [c for _, c in results]
    assert all(c > 0.4 for c in marked_corrs)
    assert "Correlation for frame: 0:" in buf.getvalue()

    # clean clip correlates near zero
    det_clean = make_settings(root, clip_path, wm_path)
    _, clean_results = detect_video(det_clean, out=io.StringIO())
    assert all(abs(c) < 0.2 for _, c in clean_results)


def test_video_generalized_me_p5(clip):
    """The video path at p=5 with a pallas engine: the generalized ME
    predictor runs the fused wide pipeline per batch (the reference
    rejects ME p>3 outright, main.cpp:88-89), the round trip through the
    raw-yuv sink detects on sampled frames, and the clean clip stays
    near zero."""
    from watermarking_gpu_tpu.models.batched import BatchedWatermark

    root, clip_path, wm_path = clip
    out_path = str(root / "marked_p5.yuv")
    engine = BatchedWatermark(H, W, wm_path, p=5, psnr=30.0, impl="pallas")
    settings = make_settings(root, clip_path, wm_path, p=5,
                             encode_watermark_file_path=out_path)
    frames = embed_video(settings, out=io.StringIO(), engine=engine)
    assert frames == N_FRAMES
    det = make_settings(root, out_path, wm_path, p=5, detect_batch=2)
    n, results = detect_video(det, out=io.StringIO(), engine=engine)
    assert n == N_FRAMES
    assert all(c > 0.25 for _, c in results)
    det_clean = make_settings(root, clip_path, wm_path, p=5)
    _, clean = detect_video(det_clean, out=io.StringIO(), engine=engine)
    assert all(abs(c) < 0.2 for _, c in clean)


def test_embed_interval_one_batched(clip, tmp_path):
    """interval=1 (the reference's real embed workload) batches sampled
    frames into one compiled dispatch shape — including the padded
    remainder — and watermarks every frame."""
    from watermarking_gpu_tpu.models import MaskType
    from watermarking_gpu_tpu.models.batched import BatchedWatermark
    root, clip_path, wm_path = clip
    out_path = str(tmp_path / "marked_all.yuv")
    settings = make_settings(root, clip_path, wm_path,
                             watermark_interval=1, embed_batch=4,
                             encode_watermark_file_path=out_path)
    engine = BatchedWatermark(H, W, wm_path, p=3, psnr=30.0, impl="xla")
    frames = embed_video(settings, engine=engine, out=io.StringIO())
    assert frames == N_FRAMES
    assert os.path.getsize(out_path) == N_FRAMES * frame_bytes(W, H)
    # exactly one compiled program: 7 = 4 + 3(padded to 4)
    fn = engine._fn_cache[("batch_embed_u8", MaskType.ME, "xla")]
    assert fn._cache_size() == 1

    original = np.frombuffer(open(clip_path, "rb").read(), dtype=np.uint8)
    marked = np.frombuffer(open(out_path, "rb").read(), dtype=np.uint8)
    fb = frame_bytes(W, H)
    for i in range(N_FRAMES):
        oy, ou, ov = split_planes(original[i * fb:(i + 1) * fb], W, H)
        my, mu, mv = split_planes(marked[i * fb:(i + 1) * fb], W, H)
        np.testing.assert_array_equal(ou, mu)
        np.testing.assert_array_equal(ov, mv)
        assert np.abs(oy.astype(int) - my.astype(int)).max() > 0, i

    # every frame detects
    det = make_settings(root, out_path, wm_path, watermark_interval=1,
                        detect_batch=4)
    _, results = detect_video(det, out=io.StringIO())
    assert len(results) == N_FRAMES
    assert all(c > 0.4 for _, c in results)


def test_detect_remainder_batch_reuses_compile(clip):
    """The final partial batch pads to the compiled (B, H, W) shape."""
    from watermarking_gpu_tpu.models import MaskType
    from watermarking_gpu_tpu.models.batched import BatchedWatermark
    root, clip_path, wm_path = clip
    settings = make_settings(root, clip_path, wm_path, watermark_interval=1,
                             detect_batch=4)
    engine = BatchedWatermark(H, W, wm_path, p=3, psnr=30.0, impl="xla")
    n, results = detect_video(settings, engine=engine, out=io.StringIO())
    assert n == N_FRAMES and len(results) == N_FRAMES   # 7 = 4 + 3 padded
    fn = engine._fn_cache[("batch_detect", MaskType.ME, "xla")]
    assert fn._cache_size() == 1


def test_oversized_video_rejected(fake_ffmpeg):
    """Streams beyond the kernel bounds fail with the reference-style
    message, not a raw VMEM compile error (cli guard parity for video)."""
    import os
    root, clip_path, wm_path = fake_ffmpeg
    ffprobe = os.environ["WM_FFPROBE"]
    text = open(ffprobe).read().replace(f'"width": {W}', '"width": 20000')
    open(ffprobe, "w").write(text)
    det = make_settings(root, "input.mp4", wm_path, raw_video_size="")
    with pytest.raises(RuntimeError, match="dimensions too high"):
        detect_video(det, out=io.StringIO())


def test_encoder_death_fails_cleanly(fake_ffmpeg, tmp_path):
    """A dying encoder child (EPIPE mid-stream) surfaces as an IOError
    instead of silently dropping frames; sources/sinks still close."""
    import os
    root, clip_path, wm_path = fake_ffmpeg
    ffmpeg = os.environ["WM_FFMPEG"]
    text = open(ffmpeg).read().replace(
        'cat > "$out"', 'head -c 20000 > "$out"')  # read ~1 frame, then exit
    open(ffmpeg, "w").write(text)
    settings = make_settings(root, "input.mp4", wm_path,
                             encode_watermark_file_path=str(
                                 tmp_path / "dead.mp4"),
                             raw_video_size="")
    with pytest.raises(IOError):
        embed_video(settings, out=io.StringIO())


def test_pixel_format_contract(fake_ffmpeg, capsys):
    """Non-yuv420p inputs: converted with a NOTE by default; aborted in
    strict mode with the reference's message (main.cpp:458-459)."""
    import os
    root, clip_path, wm_path = fake_ffmpeg
    ffprobe = os.environ["WM_FFPROBE"]
    text = open(ffprobe).read().replace("yuv420p", "yuv422p10le")
    open(ffprobe, "w").write(text)

    det = make_settings(root, "input.mp4", wm_path, raw_video_size="")
    n, _ = detect_video(det, out=io.StringIO())
    assert n == N_FRAMES
    assert "converted to yuv420p" in capsys.readouterr().out

    strict = make_settings(root, "input.mp4", wm_path, raw_video_size="",
                           strict_pixel_format=True)
    with pytest.raises(RuntimeError, match="YUV420P or YUVJ420P"):
        detect_video(strict, out=io.StringIO())


def test_missing_raw_size_errors(clip):
    root, clip_path, wm_path = clip
    s = make_settings(root, clip_path, wm_path, raw_video_size="")
    with pytest.raises(RuntimeError, match="raw_video_size"):
        detect_video(s, out=io.StringIO())


def test_odd_dimensions_rejected(clip):
    root, clip_path, wm_path = clip
    s = make_settings(root, clip_path, wm_path, raw_video_size="127x95")
    with pytest.raises(RuntimeError, match="even frame dimensions"):
        detect_video(s, out=io.StringIO())


@pytest.fixture()
def fake_ffmpeg(tmp_path, clip, monkeypatch):
    """Stub ffmpeg/ffprobe binaries that speak just enough of the CLI."""
    root, clip_path, wm_path = clip
    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"""#!/bin/bash
# decode mode: ... -i <file> -f rawvideo -pix_fmt yuv420p -
if [[ "$*" == *"-f rawvideo -pix_fmt yuv420p -" ]]; then
    cat "{clip_path}"
    exit 0
fi
# encode mode: -f rawvideo ... -i - -i <src> ... <out>; raw video on stdin
out="${{@: -1}}"
cat > "$out"
""")
    ffmpeg.chmod(0o755)
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(f"""#!/bin/bash
echo '{{"streams": [{{"width": {W}, "height": {H}, "avg_frame_rate": "25/1", "pix_fmt": "yuv420p"}}]}}'
""")
    ffprobe.chmod(0o755)
    monkeypatch.setenv("WM_FFMPEG", str(ffmpeg))
    monkeypatch.setenv("WM_FFPROBE", str(ffprobe))
    # these tests exercise the SUBPROCESS plumbing; the in-process libav
    # path (which outranks it) would reject the fake "input.mp4"
    monkeypatch.setenv("WM_NO_INPROC_VIDEO", "1")
    return root, clip_path, wm_path


def test_ffmpeg_subprocess_path(fake_ffmpeg, tmp_path, capsys):
    """The ffmpeg decode/encode plumbing works end-to-end (stub binaries):
    probing geometry, reading rawvideo from the decoder pipe, writing
    watermarked yuv into the encoder's stdin."""
    root, clip_path, wm_path = fake_ffmpeg
    out_path = str(tmp_path / "marked.mp4")
    settings = make_settings(root, "input.mp4", wm_path,
                             encode_watermark_file_path=out_path,
                             raw_video_size="")   # geometry via fake ffprobe
    frames = embed_video(settings, out=io.StringIO())
    assert frames == N_FRAMES
    # the assembled encode command is echoed like the reference (main.cpp:290)
    echoed = capsys.readouterr().out
    assert "FFmpeg encode command:" in echoed
    assert "-pix_fmt yuv420p" in echoed
    # the fake encoder writes the raw stream verbatim: compare to the
    # raw-yuv pipeline's output
    raw_out = str(root / "marked_ref.yuv")
    raw_settings = make_settings(root, clip_path, wm_path,
                                 encode_watermark_file_path=raw_out)
    embed_video(raw_settings, out=io.StringIO())
    assert open(out_path, "rb").read() == open(raw_out, "rb").read()

    # detection through the fake decoder
    det = make_settings(root, "input.mp4", wm_path, raw_video_size="")
    # point the fake decoder at the watermarked stream
    import os
    ffmpeg = os.environ["WM_FFMPEG"]
    text = open(ffmpeg).read().replace(clip_path, out_path)
    open(ffmpeg, "w").write(text)
    n, results = detect_video(det, out=io.StringIO())
    assert n == N_FRAMES
    assert all(c > 0.4 for _, c in results)


def _inproc_or_skip():
    from watermarking_gpu_tpu.video import libav
    if not libav.available():
        pytest.skip("libwmdecode.so not built (make -C native)")
    return libav


def test_inproc_encode_decode_lossless_roundtrip(tmp_path, rng):
    """In-process libav encode (ffv1, lossless) -> in-process decode
    reproduces the source frames bit-exactly, including the linesize
    de-padding (the reference's main.cpp:348-353 copy) and geometry/fps
    metadata."""
    from watermarking_gpu_tpu.video import synthesize
    libav = _inproc_or_skip()
    if not libav.codec_available("ffv1"):
        pytest.skip("ffv1 encoder not in this libavcodec")
    w, h, n = 96, 64, 6
    fb = frame_bytes(w, h)
    clip = synthesize(w, h, n, seed=11)
    path = str(tmp_path / "clip.mkv")
    enc = libav.LibavEncoder(path, w, h, 25.0, "ffv1")
    for i in range(n):
        enc.write(clip[i * fb:(i + 1) * fb])
    enc.close()
    dec = libav.LibavDecoder(path)
    assert (dec.width, dec.height, dec.pix_fmt) == (w, h, "yuv420p")
    assert dec.fps == pytest.approx(25.0)
    got = []
    while True:
        frame = dec.read()
        if frame is None:
            break
        got.append(frame)
    dec.close()
    want = np.frombuffer(clip, np.uint8).reshape(n, fb)
    np.testing.assert_array_equal(np.stack(got), want)


def test_inproc_video_embed_then_detect_end_to_end(tmp_path, clip):
    """Full video round trip with NO ffmpeg binary and NO raw fallback:
    in-process decode of a real encoded clip, watermark embed, in-process
    ENCODE of the watermarked stream (lossless ffv1 via encode_options
    translation), then in-process decode + detect — the embedded frames
    must correlate strongly, a clean clip must not. This is the
    reference's whole video story (main.cpp:245-410) running entirely
    in-process."""
    from watermarking_gpu_tpu.video import synthesize
    libav = _inproc_or_skip()
    if not libav.codec_available("ffv1"):
        pytest.skip("ffv1 encoder not in this libavcodec")
    root, _, wm_path = clip
    fb = frame_bytes(W, H)
    raw = synthesize(W, H, N_FRAMES, seed=3)
    src_path = str(tmp_path / "src.mkv")
    enc = libav.LibavEncoder(src_path, W, H, 25.0, "ffv1")
    for i in range(N_FRAMES):
        enc.write(raw[i * fb:(i + 1) * fb])
    enc.close()

    marked_path = str(tmp_path / "marked.mkv")
    settings = make_settings(root, src_path, wm_path, raw_video_size="",
                             encode_watermark_file_path=marked_path,
                             encode_options="-c:v ffv1 -level 3")
    frames = embed_video(settings, out=io.StringIO())
    assert frames == N_FRAMES

    det = make_settings(root, marked_path, wm_path, raw_video_size="")
    n, results = detect_video(det, out=io.StringIO())
    assert n == N_FRAMES
    sampled = [c for _, c in results]
    assert len(sampled) == (N_FRAMES + INTERVAL - 1) // INTERVAL
    assert all(c > 0.4 for c in sampled)

    clean = make_settings(root, src_path, wm_path, raw_video_size="")
    _, clean_results = detect_video(clean, out=io.StringIO())
    assert all(abs(c) < 0.2 for _, c in clean_results)


def _write_tone_wav(path, seconds=1.0, rate=8000):
    """A tiny pcm_s16le audio source libavformat can stream-copy."""
    import wave
    t = np.arange(int(rate * seconds)) / rate
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.sin(2 * np.pi * 440 * t) * 12000)
                      .astype(np.int16).tobytes())


def test_inproc_encoder_audio_passthrough(tmp_path):
    """The in-process encoder remuxes the copy source's audio track into
    the output (stream copy, interleaved against the video clock) — the
    equivalent of the reference's `-c:a copy -map` ffmpeg-child flags
    (main.cpp:287-289); an unreadable copy source degrades to video-only
    with a NOTE instead of failing the encode (r4 VERDICT missing #2)."""
    from watermarking_gpu_tpu.video import synthesize
    libav = _inproc_or_skip()
    if not libav.codec_available("ffv1"):
        pytest.skip("ffv1 encoder not in this libavcodec")
    wav = tmp_path / "tone.wav"
    _write_tone_wav(wav)
    w, h, n = 64, 48, 8
    fb = frame_bytes(w, h)
    raw = synthesize(w, h, n, seed=5)
    out = str(tmp_path / "with_audio.mkv")
    enc = libav.LibavEncoder(out, w, h, 25.0, "ffv1", copy_from=str(wav))
    assert enc.notes == ""          # pcm_s16le fits mkv: nothing dropped
    for i in range(n):
        enc.write(raw[i * fb:(i + 1) * fb])
    enc.close()
    assert libav.stream_count(out, "audio") == 1
    assert libav.stream_count(out, "video") == 1
    # the video stream is still losslessly intact alongside the copy
    dec = libav.LibavDecoder(out)
    got = []
    while True:
        frame = dec.read()
        if frame is None:
            break
        got.append(frame)
    dec.close()
    assert b"".join(f.tobytes() for f in got) == raw

    # unreadable copy source: NOTE recorded, video-only output written
    na = str(tmp_path / "na.mkv")
    enc2 = libav.LibavEncoder(na, w, h, 25.0, "ffv1",
                              copy_from=str(tmp_path / "missing.mkv"))
    assert "NOTE" in enc2.notes and "video only" in enc2.notes
    enc2.write(raw[:fb])
    enc2.close()
    assert libav.stream_count(na, "audio") == 0


def test_inproc_embed_keeps_audio_track(tmp_path, clip):
    """e2e: embedding an audio-bearing clip through the ffmpeg-less
    in-process path keeps the audio track in the watermarked output —
    before r5 the in-process encoder silently wrote a video-only
    container (r4 VERDICT missing #2)."""
    from watermarking_gpu_tpu.video import synthesize
    libav = _inproc_or_skip()
    if not libav.codec_available("ffv1"):
        pytest.skip("ffv1 encoder not in this libavcodec")
    root, _, wm_path = clip
    wav = tmp_path / "tone.wav"
    _write_tone_wav(wav, seconds=N_FRAMES / 25.0)
    fb = frame_bytes(W, H)
    raw = synthesize(W, H, N_FRAMES, seed=7)
    src = str(tmp_path / "src_audio.mkv")
    enc = libav.LibavEncoder(src, W, H, 25.0, "ffv1", copy_from=str(wav))
    for i in range(N_FRAMES):
        enc.write(raw[i * fb:(i + 1) * fb])
    enc.close()
    assert libav.stream_count(src, "audio") == 1

    marked = str(tmp_path / "marked_audio.mkv")
    settings = make_settings(root, src, wm_path, raw_video_size="",
                             encode_watermark_file_path=marked,
                             encode_options="-c:v ffv1")
    frames = embed_video(settings, out=io.StringIO())
    assert frames == N_FRAMES
    assert libav.stream_count(marked, "audio") == 1
    assert libav.stream_count(marked, "video") == 1


def test_inproc_decoder_threading_matches_reference_contract(tmp_path):
    """Decoder geometry guards: odd dimensions rejected; a missing file
    fails with a clear error instead of a crash."""
    libav = _inproc_or_skip()
    with pytest.raises(RuntimeError, match="open video"):
        libav.LibavDecoder(str(tmp_path / "missing.mkv"))


def test_inproc_encoder_error_unblocks_producers(tmp_path):
    """An encoder failing mid-stream with its bounded queue FULL must not
    deadlock producers or close(): the pump drains (dropping frames) and
    the error surfaces on put()/close() (r4 review finding)."""
    import threading
    import time

    libav = _inproc_or_skip()

    class FailingEncoder:
        frame_bytes = 16

        def write(self, data):
            raise IOError("disk full")

        def close(self):
            pass

    writer = libav.EncoderWriter(FailingEncoder(), depth=2)
    blocked = []

    def producer():
        try:
            for _ in range(16):
                writer.put(b"x" * 16)
                time.sleep(0.001)
        except IOError as exc:
            blocked.append(exc)

    thread = threading.Thread(target=producer)
    thread.start()
    thread.join(timeout=30)
    assert not thread.is_alive()          # producer unblocked
    assert blocked                        # ... via the surfaced error
    with pytest.raises(IOError):
        writer.close()                    # close() returns, reporting it


def test_translate_encode_options():
    from watermarking_gpu_tpu.video.pipeline import _translate_encode_options
    codec, opts = _translate_encode_options(
        "-c:v libx265 -preset fast -crf 23")
    assert codec == "libx265"
    assert opts == "preset=fast,crf=23"
    codec, opts = _translate_encode_options("")
    assert codec is None and opts == ""
    codec, opts = _translate_encode_options("-vcodec mpeg4 -q:v 3")
    assert codec == "mpeg4" and opts == "q:v=3"
    # negative numbers are VALUES, not flags; valueless flags are skipped
    # (with a printed NOTE), not silently eaten along with their neighbor
    codec, opts = _translate_encode_options("-c:v mpeg4 -qmin -1 -an -crf 23")
    assert codec == "mpeg4" and opts == "qmin=-1,crf=23"
    # a flag-shaped token after -vcodec is NOT a codec name ("-an" would
    # request a nonsense encoder); both fall to the skipped/NOTE path
    codec, opts = _translate_encode_options("-vcodec -an -crf 23")
    assert codec is None and opts == "crf=23"


def test_video_dims_guard_scopes_to_fused_path():
    """The VMEM width bound belongs to the fused p=3 kernels; at p>3 the
    generalized ME predictor runs on XLA and wide streams must pass."""
    import pytest

    from watermarking_gpu_tpu.ops.pallas.fused import max_supported_cols
    from watermarking_gpu_tpu.video.pipeline import _check_video_dims

    too_wide = max_supported_cols("me", 3) + 16
    with pytest.raises(RuntimeError, match="dimensions too high"):
        _check_video_dims(too_wide, 64, p=3)
    _check_video_dims(too_wide, 64, p=5)   # no VMEM strip bound on XLA
