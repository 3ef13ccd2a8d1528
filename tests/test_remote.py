"""Remote operation: HMAC-authenticated control + UDP sound/graph streams."""

import numpy as np
import pytest

from quisk_tpu.app.remote import (ControlHeadClient, RemoteRadioServer,
                                  UdpStreamRx, UdpStreamTx, pack_sound,
                                  unpack_graph, unpack_sound)


def test_control_auth_and_commands():
    srv = RemoteRadioServer(secret="s3cret")
    port = srv.start()
    try:
        c = ControlHeadClient("s3cret", "127.0.0.1", port)
        assert c.command("freq 14074000") == "14074000"
        assert c.command("freq") == "14074000"
        assert c.command("mode LSB") == "LSB"
        assert c.command("ptt 1") == "1"
        assert srv.state["ptt"] is True
        assert c.command("nonsense") == "ERR unknown"
        c.close()
    finally:
        srv.stop()


def test_control_rejects_bad_secret():
    srv = RemoteRadioServer(secret="right")
    port = srv.start()
    try:
        with pytest.raises(PermissionError):
            ControlHeadClient("wrong", "127.0.0.1", port)
    finally:
        srv.stop()


def test_udp_sound_graph_roundtrip_and_loss_counting():
    rx = UdpStreamRx()
    tx = UdpStreamTx(("127.0.0.1", rx.port))
    audio = np.sin(np.linspace(0, 20, 480)).astype(np.float32) * 0.7
    tx.send_sound(audio)
    kind, data = rx.recv()
    assert kind == "sound"
    assert np.max(np.abs(data - audio)) < 1e-3        # 16-bit quantisation
    db = np.linspace(-140.0, -20.0, 256)
    tx.send_graph(db)
    kind, data = rx.recv()
    assert kind == "graph"
    assert np.max(np.abs(data - db)) < 0.01           # centi-dB quantisation
    # drop a packet: sequence gap counted
    tx.seq += 3
    tx.send_sound(audio)
    rx.recv()
    assert rx.lost == 3


def test_sound_packet_format():
    pkt = pack_sound(7, np.zeros(16, np.float32))
    assert unpack_graph(pkt) is None
    seq, data = unpack_sound(pkt)
    assert seq == 7 and len(data) == 16
