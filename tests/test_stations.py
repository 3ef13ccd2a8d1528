"""Favorites table, memory stations, station markers, FM repeater shift
(parity ConfigFavorites quisk.py:1757-1967, memoryState 6228-6264,
StationScreen 2598-2675, repeater offset 6677-6693)."""

import numpy as np

from quisk_tpu.app.config import RadioConfig, Settings
from quisk_tpu.app.radio import Radio
from quisk_tpu.app.stations import Favorites, MemoryBank, station_markers
from quisk_tpu.hw.base import Hardware

FS = 48000.0


class SilentHW(Hardware):
    def read_samples(self, n):
        return np.zeros((1, n), np.complex64)


def test_favorites_file_roundtrip_and_hz_correction(tmp_path):
    p = tmp_path / "quisk_favorites.txt"
    p.write_text("my net|7210000|LSB|My net 2030 UTC every Thursday\n"
                 "10m FM 1|29.620|FM|Fm local 10 meter repeater|-0.1|88.5\n")
    fav = Favorites(str(p))
    # old Hz entry corrected to MHz on read (quisk.py:1845-1852)
    assert fav.entries[0].freq_hz == 7_210_000
    assert fav.entries[1].freq_hz == 29_620_000
    fav.add("FT8 20m", 14_074_000, "USB", "digital watering hole")
    fav.move(2, -1)
    assert fav.entries[1].name == "FT8 20m"
    fav.save()
    fav2 = Favorites(str(p))
    assert [e.name for e in fav2.entries] == ["my net", "FT8 20m", "10m FM 1"]
    assert fav2.entries[1].freq_hz == 14_074_000
    # repeater dictionary keys round to 1 kHz (MakeRepeaterDict)
    rd = fav2.repeater_dict()
    assert rd == {29_620_000: (-0.1, 88.5)}


def test_memory_bank_semantics():
    mb = MemoryBank()
    mb.save(14_200_000, "20", 14_100_000, 100_000, "USB")
    mb.save(7_050_000, "40", 7_000_000, 50_000, "LSB")
    mb.save(14_200_000, "20", 14_100_000, 100_000, "AM")  # replace
    assert [s.freq for s in mb.stations] == [7_050_000, 14_200_000]
    assert mb.stations[1].mode == "AM"
    # next wraps (OnBtnMemNext)
    assert mb.next_after(7_050_000).freq == 14_200_000
    assert mb.next_after(14_200_000).freq == 7_050_000
    assert mb.delete(7_050_000) and len(mb) == 1
    # round-trips through the persisted list form
    mb2 = MemoryBank(mb.to_list())
    assert mb2.stations == mb.stations


def test_radio_memory_buttons_and_persistence(tmp_path):
    s = Settings(tmp_path / "s.json")
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7_050_000.0, agc=False),
              hardware=SilentHW(), settings=s)
    r.set_band("40")
    f40 = r.freq_hz
    r.save_memory()
    r.set_band("20")
    r.save_memory()
    f20 = r.freq_hz
    assert len(r.memories) == 2
    # next from 20 m wraps to the 40 m entry and switches band
    r.next_memory()
    assert r.band == "40" and r.freq_hz == f40
    r.next_memory()
    assert r.band == "20" and r.freq_hz == f20
    r.delete_memory()
    assert len(r.memories) == 1
    # persisted: a new Radio on the same settings restores the bank
    s.save()
    r2 = Radio(RadioConfig(sample_rate=FS, tune_hz=7_050_000.0, agc=False),
               hardware=SilentHW(), settings=Settings(tmp_path / "s.json"))
    assert len(r2.memories) == 1 and r2.memories.stations[0].freq == f40


def test_station_markers_merge_and_sort():
    from quisk_tpu.app.interop import parse_spot
    fav = Favorites()
    fav.add("netA", 7_210_000, "LSB")
    fav.add("out-of-span", 29_620_000, "FM")
    mb = MemoryBank()
    mb.save(7_100_000, "40", 7_000_000, 100_000, "USB")
    spot = parse_spot("DX de W1AW: 7015.0 DL1ABC nice sig 1223Z")
    rows = station_markers(6_900_000, 7_400_000, favorites=fav,
                           memories=mb, dx_spots=[spot])
    assert [m["kind"] for m in rows] == ["dx", "mem", "fav"]
    assert rows[0]["freq"] == 7_015_000.0 and rows[0]["name"] == "DL1ABC"
    assert rows[2]["freq"] == 7_210_000


def test_tune_favorite_sets_mode_and_freq():
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7_050_000.0, agc=False),
              hardware=SilentHW())
    fav = r.enable_favorites()
    fav.add("netA", 7_210_000, "LSB")
    r.tune_favorite(0)
    assert r.freq_hz == 7_210_000 and r.cfg.mode == "LSB"


def test_fm_repeater_shift_and_ctcss_on_key():
    hw = SilentHW()
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=29_620_000.0, mode="FM",
                          agc=False), hardware=hw)
    r.open()
    r.enable_tx()
    fav = r.enable_favorites()
    fav.add("rptr", 29_620_000, "FM", offset_khz=-100, tone_hz=88.5)
    assert float(r.tx.ctcss_amp) == 0.0
    # key down: TX dial shifts by the offset, CTCSS tone installed
    r.set_ptt(True)
    r.run_once()
    assert hw.tx_frequency == 29_620_000 - 100_000
    assert float(r.tx.ctcss_amp) > 0.0
    w = float(r.tx.ctcss_word) * FS / (2 * np.pi)
    assert abs(w - 88.5) < 0.01
    # key up: dial restored, tone off
    r.set_ptt(False)
    r.run_once()
    assert hw.tx_frequency == 29_620_000
    assert float(r.tx.ctcss_amp) == 0.0


def test_webui_state_carries_station_markers():
    from quisk_tpu.app.webui import WebUIServer
    r = Radio(RadioConfig(sample_rate=FS, tune_hz=7_050_000.0, agc=False),
              hardware=SilentHW())
    fav = r.enable_favorites()
    fav.add("netA", 7_060_000, "LSB")
    srv = WebUIServer(r)
    st = srv.state_dict()
    assert st["stations"] and st["stations"][0]["name"] == "netA"
    assert st["split"] == 0 and st["rit"] == 0.0
