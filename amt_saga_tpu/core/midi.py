"""Standard MIDI File writer + parser (SURVEY.md C6, layer L1).

The environment has no pretty_midi/mido (SURVEY.md §7), so this is a
self-contained SMF type-0 encoder/decoder.  Determinism rules (the
bit-for-bit parity surface):

* Events are emitted in canonical note order (see
  :meth:`NoteSequence.sorted`), then as a single merged event stream sorted
  by (tick, is_note_on, pitch, program): at equal ticks all note-offs
  precede all note-ons.
* Note-off is encoded as status 0x80 with velocity 64 (never 0x90 vel 0).
* Running status IS used: a status byte is omitted iff identical to the
  previous event's status.  This exercises the encoding path the reference
  relied on pretty_midi for.
* One tempo meta event (120 bpm) + one program-change per channel at tick 0.
* Instruments map to channels 0..15 (skipping 9, the GM drum channel).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .notes import (
    TEMPO_US_PER_BEAT,
    TICKS_PER_BEAT,
    NoteSequence,
    seconds_to_ticks,
)


def _var_len(value: int) -> bytes:
    """MIDI variable-length quantity encoding."""
    if value < 0:
        raise ValueError("negative delta time")
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def _read_var_len(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    while True:
        b = data[pos]
        pos += 1
        value = (value << 7) | (b & 0x7F)
        if not (b & 0x80):
            return value, pos


def _program_to_channel(programs: List[int]) -> Dict[int, int]:
    """Deterministic program -> channel map; channel 9 (drums) skipped."""
    chans = [c for c in range(16) if c != 9]
    mapping: Dict[int, int] = {}
    for p in sorted(set(programs)):
        if len(mapping) >= len(chans):
            raise ValueError("more than 15 distinct programs")
        mapping[p] = chans[len(mapping)]
    return mapping


def notes_to_midi_bytes(seq: NoteSequence) -> bytes:
    """Encode a NoteSequence as a type-0 SMF byte string (deterministic)."""
    canonical = seq.sorted()
    programs = [n.program for n in canonical] or [0]
    chan_of = _program_to_channel(programs)

    # Event order: (tick, order_class, pitch, program) with class
    # 0 = note-off, 1 = note-on, so offs sort first at a tick.
    # Vectorized construction: within each class events keep canonical
    # note order (as the append+stable-sort loop did), and lexsort is
    # stable, so byte order is identical to the scalar build — full-key
    # ties can only differ in velocity, and within a class canonical
    # order decides those the same way in both constructions.
    k = len(canonical.notes)
    tps = TICKS_PER_BEAT * 1_000_000.0 / TEMPO_US_PER_BEAT
    onset = np.fromiter((n.onset for n in canonical.notes), np.float64, k)
    dur = np.fromiter((n.duration for n in canonical.notes),
                      np.float64, k)
    pit = np.fromiter((n.pitch for n in canonical.notes), np.int64, k)
    prg = np.fromiter((n.program for n in canonical.notes), np.int64, k)
    vel = np.fromiter((n.velocity for n in canonical.notes), np.int64, k)
    on_t = np.rint(onset * tps).astype(np.int64)
    off_t = on_t + np.maximum(1, np.rint(dur * tps).astype(np.int64))
    ch_arr = np.fromiter((chan_of[int(g)] for g in prg), np.int64, k) \
        if k else np.zeros(0, np.int64)
    vel_c = np.clip(vel, 1, 127)
    # offs (class 0) concatenated before ons (class 1), each in
    # canonical note order.
    e_tick = np.concatenate([off_t, on_t])
    e_cls = np.concatenate([np.zeros(k, np.int64), np.ones(k, np.int64)])
    e_pit = np.concatenate([pit, pit])
    e_prg = np.concatenate([prg, prg])
    e_status = np.concatenate([0x80 | ch_arr, 0x90 | ch_arr])
    e_d2 = np.concatenate([np.full(k, 64, np.int64), vel_c])
    order = np.lexsort((e_prg, e_pit, e_cls, e_tick))

    track = bytearray()
    # Tempo meta at tick 0.
    track += _var_len(0) + bytes([0xFF, 0x51, 0x03])
    track += struct.pack(">I", TEMPO_US_PER_BEAT)[1:]
    # Program changes at tick 0, ordered by channel.
    for prog, ch in sorted(chan_of.items(), key=lambda kv: kv[1]):
        track += _var_len(0) + bytes([0xC0 | ch, prog & 0x7F])

    last_tick = 0
    last_status = -1
    et, es = e_tick[order].tolist(), e_status[order].tolist()
    ep, ed = e_pit[order].tolist(), e_d2[order].tolist()
    for tick, status, d1, d2 in zip(et, es, ep, ed):
        track += _var_len(tick - last_tick)
        if status != last_status:
            track.append(status)
            last_status = status
        track += bytes([d1, d2])
        last_tick = tick

    # End of track.
    track += _var_len(0) + bytes([0xFF, 0x2F, 0x00])

    header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, TICKS_PER_BEAT)
    return header + b"MTrk" + struct.pack(">I", len(track)) + bytes(track)


def write_midi(path: str, seq: NoteSequence) -> None:
    with open(path, "wb") as f:
        f.write(notes_to_midi_bytes(seq))


def midi_bytes_to_notes(data: bytes, *, sustain: bool = True
                        ) -> NoteSequence:
    """Decode an SMF (type 0 or 1) byte string into a NoteSequence.

    Handles running status, tempo changes (uses the last tempo seen before
    an event for tick->sec conversion via a tempo map), and both
    note-off encodings (0x80, or 0x90 with velocity 0).

    ``sustain`` applies CC64 sustain-pedal semantics (the MAESTRO
    ground-truth convention): a note released while the pedal is down on
    its channel keeps sounding until the pedal comes up — or until the
    same pitch is re-struck, whichever is first.  MIDIs without CC64
    events (e.g. this package's own writer output) decode identically
    either way.
    """
    if data[:4] != b"MThd":
        raise ValueError("not a MIDI file")
    hlen, fmt, ntrks, division = struct.unpack(">IHHH", data[4:14])
    if division & 0x8000:
        raise ValueError("SMPTE division not supported")
    pos = 8 + hlen

    # Collect (abs_tick, kind, payload) across all tracks.
    tempo_map: List[Tuple[int, int]] = [(0, TEMPO_US_PER_BEAT)]
    raw: List[Tuple[int, int, int, int, int]] = []  # tick, on, ch, pitch, vel
    prog_events: List[Tuple[int, int, int]] = []  # tick, ch, program
    cc64_events: List[Tuple[int, int, int]] = []  # tick, ch, value

    for _ in range(ntrks):
        if data[pos:pos + 4] != b"MTrk":
            raise ValueError("bad track chunk")
        tlen = struct.unpack(">I", data[pos + 4:pos + 8])[0]
        tpos = pos + 8
        tend = tpos + tlen
        pos = tend
        tick = 0
        status = 0
        p = tpos
        while p < tend:
            delta, p = _read_var_len(data, p)
            tick += delta
            b0 = data[p]
            if b0 & 0x80:
                status = b0
                p += 1
            if status == 0xFF:  # meta
                mtype = data[p]
                mlen, p2 = _read_var_len(data, p + 1)
                body = data[p2:p2 + mlen]
                p = p2 + mlen
                if mtype == 0x51 and mlen == 3:
                    tempo_map.append(
                        (tick, struct.unpack(">I", b"\x00" + body)[0]))
            elif status in (0xF0, 0xF7):  # sysex
                mlen, p2 = _read_var_len(data, p)
                p = p2 + mlen
            else:
                hi = status & 0xF0
                ch = status & 0x0F
                if hi in (0x80, 0x90, 0xA0, 0xB0, 0xE0):
                    d1, d2 = data[p], data[p + 1]
                    p += 2
                    if hi == 0x90:
                        raw.append((tick, 1 if d2 > 0 else 0, ch, d1, d2))
                    elif hi == 0x80:
                        raw.append((tick, 0, ch, d1, d2))
                    elif hi == 0xB0 and d1 == 64:
                        cc64_events.append((tick, ch, d2))
                elif hi in (0xC0, 0xD0):
                    d1 = data[p]
                    p += 1
                    if hi == 0xC0:
                        prog_events.append((tick, ch, d1))
                else:
                    raise ValueError(f"bad status byte {status:#x}")

    tempo_map.sort()

    def tick_to_sec(t: int) -> float:
        sec = 0.0
        prev_t, prev_tempo = tempo_map[0]
        for tt, tempo in tempo_map[1:]:
            if tt >= t:
                break
            sec += (tt - prev_t) * prev_tempo / (division * 1e6)
            prev_t, prev_tempo = tt, tempo
        sec += (t - prev_t) * prev_tempo / (division * 1e6)
        return sec

    chan_prog = {ch: 0 for ch in range(16)}
    for _, ch, prog in sorted(prog_events):
        chan_prog[ch] = prog

    if sustain and cc64_events:
        raw = _apply_sustain(raw, cc64_events)

    seq = NoteSequence()
    active: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    raw.sort(key=lambda e: (e[0], e[1], e[3], e[2]))
    for tick, on, ch, pitch, vel in raw:
        key = (ch, pitch)
        if on:
            active.setdefault(key, []).append((tick, vel))
        else:
            stack = active.get(key)
            if stack:
                on_tick, on_vel = stack.pop(0)
                seq.add(
                    tick_to_sec(on_tick),
                    max(1e-6, tick_to_sec(tick) - tick_to_sec(on_tick)),
                    pitch,
                    on_vel,
                    chan_prog[ch],
                )
    return seq.sorted()


def _apply_sustain(
    raw: List[Tuple[int, int, int, int, int]],
    cc64_events: List[Tuple[int, int, int]],
) -> List[Tuple[int, int, int, int, int]]:
    """Extend note-offs through CC64 pedal-down intervals.

    A note-off at tick t while the pedal is down on its channel moves to
    the pedal-up tick, truncated at the next same-(channel, pitch)
    note-on if that comes first (the pretty_midi/MAESTRO convention).
    """
    # Per-channel pedal-down intervals [down, up); a pedal still down at
    # end-of-track holds forever.
    intervals: Dict[int, List[Tuple[int, float]]] = {}
    down_at: Dict[int, int] = {}
    for tick, ch, val in sorted(cc64_events):
        if val >= 64:
            down_at.setdefault(ch, tick)
        elif ch in down_at:
            intervals.setdefault(ch, []).append((down_at.pop(ch), tick))
    for ch, t0 in down_at.items():
        intervals.setdefault(ch, []).append((t0, float("inf")))

    ons: Dict[Tuple[int, int], List[int]] = {}
    for tick, on, ch, pitch, _vel in raw:
        if on:
            ons.setdefault((ch, pitch), []).append(tick)
    for ticks in ons.values():
        ticks.sort()

    import bisect

    out: List[Tuple[int, int, int, int, int]] = []
    for tick, on, ch, pitch, vel in raw:
        if not on:
            for d, u in intervals.get(ch, ()):
                if d <= tick < u:
                    ext = u
                    key_ons = ons.get((ch, pitch), ())
                    i = bisect.bisect_right(key_ons, tick)
                    if i < len(key_ons) and key_ons[i] < ext:
                        ext = key_ons[i]
                    tick = int(ext) if ext != float("inf") else tick
                    break
        out.append((tick, on, ch, pitch, vel))
    return out


def read_midi(path: str, *, sustain: bool = True) -> NoteSequence:
    with open(path, "rb") as f:
        return midi_bytes_to_notes(f.read(), sustain=sustain)
