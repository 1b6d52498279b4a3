"""Recurrent nets: forward + bidirectional RNN/GRU/LSTM vs the torch
oracle (the reference runs these through tract Scan subgraphs,
`src/graph/model.rs:783-969`; here static seq lengths unroll the cells).

ONNX fixtures are serialized with `ezkl_tpu.graph.onnx_writer` (the image
has no `onnx` package, which torch's exporter requires); torch itself is
only the numerical oracle.
"""

import numpy as np
import pytest

from ezkl_tpu.graph import onnx_writer as ow
from ezkl_tpu.graph.circuit import GraphCircuit
from ezkl_tpu.graph.run_args import RunArgs

torch = pytest.importorskip("torch")

# gate-order maps torch -> ONNX: LSTM ifgo -> iofc; GRU rzn -> zrh
_REORDER = {"LSTM": [0, 3, 1, 2], "GRU": [1, 0, 2], "RNN": [0]}


def _stack_dir(cell, kind, H, suffix):
    perm = _REORDER[kind]
    wi = getattr(cell, f"weight_ih_l0{suffix}").detach().numpy()
    wh = getattr(cell, f"weight_hh_l0{suffix}").detach().numpy()
    bi = getattr(cell, f"bias_ih_l0{suffix}").detach().numpy()
    bh = getattr(cell, f"bias_hh_l0{suffix}").detach().numpy()
    g = len(perm)
    wi = wi.reshape(g, H, -1)[perm].reshape(g * H, -1)
    wh = wh.reshape(g, H, -1)[perm].reshape(g * H, -1)
    bi = bi.reshape(g, H)[perm].reshape(-1)
    bh = bh.reshape(g, H)[perm].reshape(-1)
    return wi, wh, np.concatenate([bi, bh])


def _onnx_of(tmp_path, cell, kind, H, bidi):
    sufs = [""] + (["_reverse"] if bidi else [])
    Ws, Rs, Bs = [], [], []
    for s in sufs:
        wi, wh, b = _stack_dir(cell, kind, H, s)
        Ws.append(wi)
        Rs.append(wh)
        Bs.append(b)
    W = np.stack(Ws).astype(np.float64)
    R = np.stack(Rs).astype(np.float64)
    B = np.stack(Bs).astype(np.float64)
    D = len(sufs)
    attrs = dict(hidden_size=H,
                 direction=b"bidirectional" if bidi else b"forward")
    if kind == "GRU":
        attrs["linear_before_reset"] = 1
    nd = ow.node(kind, ["x", "W", "R", "B"], ["y", "yh"], **attrs)
    path = tmp_path / "net.onnx"
    ow.save(path, [nd], {"x": (SEQ, 1, cell.input_size)},
            {"y": (SEQ, D, 1, H)},
            {"W": W, "R": R, "B": B})
    return str(path)


SEQ = 5


def _check(tmp_path, cell, kind, H, bidi, atol=0.15):
    x = np.random.default_rng(hash(kind) % 97).normal(
        0, 0.5, (SEQ, 1, cell.input_size))
    path = _onnx_of(tmp_path, cell, kind, H, bidi)
    ra = RunArgs(input_scale=7, param_scale=7, lookup_range=(-65536, 65536))
    gc = GraphCircuit.from_onnx(path, ra)
    gc.gen_settings([x])
    w = gc.gen_witness([x])
    got = np.asarray(w["pretty_elements"]["rescaled_outputs"][0], np.float64)
    with torch.no_grad():
        want = cell(torch.tensor(x, dtype=torch.float32))[0].numpy()
    # torch y: (seq, batch, D*H); ours: (seq, D, batch, H)
    D = 2 if bidi else 1
    want = want.reshape(SEQ, 1, D, H).transpose(0, 2, 1, 3)
    assert got.reshape(-1).shape == want.reshape(-1).shape
    assert np.allclose(got.reshape(-1), want.reshape(-1), atol=atol), (
        got.reshape(-1)[:6], want.reshape(-1)[:6])
    assert gc.mock_prove([x]) == []


@pytest.mark.parametrize("bidi", [False, True])
def test_lstm_directions(tmp_path, bidi):
    torch.manual_seed(0)
    cell = torch.nn.LSTM(input_size=4, hidden_size=3, bidirectional=bidi)
    _check(tmp_path, cell, "LSTM", 3, bidi)


def test_gru_bidirectional(tmp_path):
    torch.manual_seed(1)
    cell = torch.nn.GRU(input_size=3, hidden_size=4, bidirectional=True)
    _check(tmp_path, cell, "GRU", 4, True)


def test_rnn_bidirectional(tmp_path):
    torch.manual_seed(2)
    cell = torch.nn.RNN(input_size=3, hidden_size=3, nonlinearity="tanh",
                        bidirectional=True)
    _check(tmp_path, cell, "RNN", 3, True)
