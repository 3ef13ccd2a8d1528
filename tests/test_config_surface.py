"""Runtime config surface: view/edit/persist the flag registry on a
running radio + the configure.py:543-588 restart round trip.

Surfaces under test: the ``quisk-tpu config`` CLI (list/get/set/unset),
``Radio.set_flag``/``flags_dict``, and the web UI's ``/flags`` JSON
endpoint + ``{"cmd": "flag"}`` WebSocket command.
"""

import json
import socket
import urllib.request

from quisk_tpu.app.cli import main as cli_main
from quisk_tpu.app.config import (RadioConfig, Settings,
                                  default_settings_path)
from quisk_tpu.app.flags import REGISTRY
from quisk_tpu.app.radio import Radio


def test_cli_config_set_get_round_trip(tmp_path, capsys):
    db = str(tmp_path / "settings.json")
    # set a numeric flag (JSON value) and a text flag (bare string)
    assert cli_main(["config", "set", "graph_refresh", "12",
                     "--settings", db]) == 0
    assert cli_main(["config", "set", "cwTone", "700",
                     "--settings", db]) == 0
    capsys.readouterr()
    # fresh process equivalent: re-open the db via a new Settings
    assert cli_main(["config", "get", "graph_refresh",
                     "--settings", db]) == 0
    assert json.loads(capsys.readouterr().out) == 12
    # list --changed shows exactly the two overrides
    assert cli_main(["config", "list", "--changed",
                     "--settings", db]) == 0
    out = capsys.readouterr().out
    assert "graph_refresh" in out and "cwTone" in out
    assert out.count("\n") == 2
    # unset restores the default
    assert cli_main(["config", "unset", "graph_refresh",
                     "--settings", db]) == 0
    capsys.readouterr()
    assert cli_main(["config", "get", "graph_refresh",
                     "--settings", db]) == 0
    assert json.loads(capsys.readouterr().out) == \
        REGISTRY["graph_refresh"].default


def test_cli_config_rejects_bad_values(tmp_path, capsys):
    db = str(tmp_path / "settings.json")
    # wrong type
    assert cli_main(["config", "set", "graph_refresh", "\"fast\"",
                     "--settings", db]) == 1
    # unknown flag
    assert cli_main(["config", "set", "no_such_flag", "1",
                     "--settings", db]) == 1
    assert cli_main(["config", "get", "no_such_flag",
                     "--settings", db]) == 1
    capsys.readouterr()


def test_cli_config_sections_and_docs(capsys, tmp_path):
    db = str(tmp_path / "settings.json")
    assert cli_main(["config", "sections", "--settings", db]) == 0
    secs = capsys.readouterr().out.split()
    assert len(secs) >= 3
    assert cli_main(["config", "list", "--section", secs[0],
                     "--settings", db]) == 0
    out = capsys.readouterr().out
    assert out and all(ln.split()[0].lstrip("*") == secs[0]
                       or ln.split()[1] == secs[0]
                       for ln in out.strip().splitlines())


def test_radio_flag_restart_round_trip(tmp_path):
    """Edit a flag on a live radio, restart, observe it restored —
    the reference's configure.py JSON load/store round trip."""
    db = tmp_path / "settings.json"
    cfg = RadioConfig(name="myradio", sample_rate=48000.0)
    r = Radio(cfg, hardware="sim", settings=Settings(db))
    assert r.get_flag("cwTone") == REGISTRY["cwTone"].default
    r.set_flag("cwTone", 750)
    r.set_flag("graph_refresh", 10)
    r.close()
    # "restart": a fresh Radio + fresh Settings off the same db
    r2 = Radio(RadioConfig(name="myradio", sample_rate=48000.0),
               hardware="sim", settings=Settings(db))
    assert r2.get_flag("cwTone") == 750
    assert r2.get_flag("graph_refresh") == 10
    d = r2.flags_dict(changed_only=True)
    assert set(d) == {"cwTone", "graph_refresh"}
    assert d["cwTone"]["changed"] is True
    # a different named radio is unaffected
    r3 = Radio(RadioConfig(name="other", sample_rate=48000.0),
               hardware="sim", settings=Settings(db))
    assert r3.get_flag("cwTone") == REGISTRY["cwTone"].default
    r2.close()
    r3.close()


def test_default_settings_path_env(monkeypatch, tmp_path):
    monkeypatch.setenv("QUISK_TPU_SETTINGS", str(tmp_path / "s.json"))
    assert str(default_settings_path()) == str(tmp_path / "s.json")


def test_webui_flags_endpoint_and_command(tmp_path):
    from test_tci import WsClient

    db = tmp_path / "settings.json"
    cfg = RadioConfig(name="web", sample_rate=48000.0)
    r = Radio(cfg, hardware="sim", settings=Settings(db))
    try:
        port = r.enable_webui(port=0)
        # GET /flags returns the registry with values
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/flags?section=display",
                timeout=5) as resp:
            d = json.loads(resp.read())
        assert "graph_refresh" in d
        assert d["graph_refresh"]["value"] == REGISTRY["graph_refresh"].default
        assert all(v["section"] == "display" for v in d.values())
        # edit over the WebSocket -> validated, applied, persisted
        ws = WsClient(port, path="/ws")
        ws.send_text(json.dumps({"cmd": "flag", "name": "graph_refresh",
                                 "value": 15}))
        import time as _t
        t0 = _t.monotonic()
        while r.get_flag("graph_refresh") != 15:
            assert _t.monotonic() - t0 < 5.0
            _t.sleep(0.02)
        ws.s.close()
    finally:
        r.close()
    assert Settings(db).get_flags("web").get("graph_refresh") == 15
