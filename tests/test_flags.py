"""Flag catalogue surface (references quisk_conf_defaults.py's 182
documented tunables and configure.py's parsing/validation of them)."""

import pytest

from quisk_tpu.app import flags as F
from quisk_tpu.app.config import RadioConfig, Settings


def test_catalogue_breadth_and_sections():
    # the reference documents 182 flags; we carry the full surface
    assert len(F.REGISTRY) >= 170
    secs = F.sections()
    for wanted in ("hardware", "hermes", "sound", "tx", "keyer", "cat",
                   "display", "bands"):
        assert wanted in secs


def test_defaults_match_reference_semantics():
    fl = F.Flags()
    assert fl.sample_rate == 48000
    assert fl.rx_udp_clock == 122880000
    assert fl.si570_xtal_freq == 114285000
    assert fl.cwTone == 600
    assert fl.hamlib_port == 4532
    assert fl.BandEdge["40"] == (7000000, 7300000)
    assert fl.graph_refresh == 7


def test_validation():
    fl = F.Flags()
    fl.sample_rate = 192000
    assert fl.sample_rate == 192000
    with pytest.raises(TypeError):
        fl.sample_rate = "fast"
    with pytest.raises(ValueError):
        fl.playback_rate = 44100          # not a legal choice
    with pytest.raises(KeyError):
        fl.set("no_such_flag", 1)
    # int -> float coercion for 'number' flags
    fl.agc_release_time = 2
    assert fl.agc_release_time == 2.0
    # bool-ish ints for booleans
    fl.hermes_power_amp = 1
    assert fl.hermes_power_amp is True


def test_overrides_roundtrip():
    fl = F.Flags(cwTone=700, tci_port=40001)
    ov = fl.overrides()
    assert ov == {"cwTone": 700, "tci_port": 40001}
    back = F.Flags.from_json(ov)
    assert back.cwTone == 700 and back.tci_port == 40001
    # dict flags survive JSON list/tuple round-trip
    import json
    fl2 = F.Flags()
    fl2.BandEdge = {"40": (7000000, 7200000)}
    j = json.loads(json.dumps(fl2.to_json()))
    back2 = F.Flags.from_json(j)
    assert back2.BandEdge["40"] == (7000000, 7200000)


def test_platform_flag():
    fl = F.Flags()
    fl.lin_latency_millisecs = 80
    assert F.platform_flag(fl, "latency_millisecs", "lin") == 80
    assert F.platform_flag(fl, "latency_millisecs", "win") == 150


def test_load_config_file(tmp_path):
    p = tmp_path / "quisk_conf.py"
    p.write_text(
        "# my radio\n"
        "sample_rate = 96000\n"
        "cwTone = 500\n"
        "custom_thing = 42\n"
        "BandEdge = {'40': (7000000, 7100000)}\n")
    fl, unknown = F.load_config_file(str(p))
    assert fl.sample_rate == 96000
    assert fl.cwTone == 500
    assert fl.BandEdge["40"] == (7000000, 7100000)
    assert unknown == ["custom_thing"]
    with pytest.raises(KeyError):
        F.load_config_file(str(p), strict=True)


def test_docs_markdown_covers_every_flag():
    doc = F.docs_markdown()
    for name in F.REGISTRY:
        assert f"`{name}`" in doc


def test_radioconfig_from_flags_and_settings(tmp_path):
    fl = F.Flags(sample_rate=192000, cwTone=650)
    cfg = RadioConfig.from_flags(fl, name="r1")
    assert cfg.sample_rate == 192000.0
    assert cfg.cw_pitch == 650.0
    s = Settings(tmp_path / "settings.json")
    s.add_radio(cfg)
    s.set_flags("r1", fl)
    s.save()
    s2 = Settings(tmp_path / "settings.json")
    assert s2.get_radio("r1").cw_pitch == 650.0
    assert s2.get_flags("r1").sample_rate == 192000
    assert s2.get_flags("other").sample_rate == 48000   # defaults


def test_serial_cts_choices_match_reference_and_serialkey(tmp_path):
    """The CTS/DSR choice strings are the reference's exact config values
    (quisk_conf_defaults.py:1878-1891 'CW when high/low'), so existing
    configs load AND SerialKey's polarity parser understands the registry's
    own values."""
    from quisk_tpu.app.cw import SerialKey

    p = tmp_path / "quisk_conf.py"
    p.write_text('quisk_serial_cts = "CW when low"\n'
                 'quisk_serial_dsr = "PTT when high"\n')
    fl, unknown = F.load_config_file(str(p), strict=True)
    assert fl.quisk_serial_cts == "CW when low"
    assert unknown == []
    # every registry choice parses to the intended (use, invert) pair
    for choice in F.REGISTRY["quisk_serial_cts"].choices:
        use, invert = SerialKey._parse(choice)
        assert use in "NCP"
        assert invert == ("when low" in choice)
