#!/usr/bin/env python
"""Mechanically extract the diagonal-norm SBP coefficient tables.

The SBP boundary-closure coefficients are mathematical constants from the
literature (Gustafsson 2008; Strand 1994; Mattsson-Svard-Shoeybi 2008;
Mattsson-Almquist 2013; Mattsson 2012 narrow-stencil variable-coefficient
operators).  The upstream reference (`/root/reference/diagonal_sbp.jl`)
carries them as Julia source literals.  Hand-transcribing hundreds of
rational/decimal constants is the #1 correctness risk of the rebuild, so this
tool parses them *mechanically* out of the Julia source and stores them as
NumPy arrays in ``hybridsbp_tpu/ops1d/data/sbp_tables.npz``.  The generated
artifact is committed so the framework is fully standalone.

Float semantics: Julia and Python both evaluate e.g. ``48/17`` as IEEE-754
double division of exactly-represented integers, so the extracted values are
bit-identical to what the reference computes.

Stored keys
-----------
d1_p{p}_bhinv, d1_p{p}_d, d1_p{p}_bd          for p in 2,4,6,8,10
d2_p{p}_bhinv, d2_p{p}_d, d2_p{p}_bd, d2_p{p}_BS
vd2_p{p}_bhinv, vd2_p{p}_BS                   for p in 2,4,6
vd2_p{p}_W0   (m, m, nb) tensor: boundary block entries are linear in the
              first nb coefficient samples, V_M0[i,j] = sum_k W0[i,j,k]*B[k]
              (p=4: m=6, nb=8;  p=6: m=9, nb=12)

Verification performed here: the Julia source defines the far-end block V_MN
independently; we parse it too and assert the expected flip symmetry
WN[i,j,:] == W0[m-1-i, m-1-j, :], catching any parse error.
"""
import re
import numpy as np

REF = "/root/reference/diagonal_sbp.jl"


def _julia_expr_to_python(s: str) -> str:
    """Convert a Julia scalar expression to evaluable Python.

    Handles implicit multiplication (``8(...)``, ``(12/17)b1``,
    ``0.79...b1``, ``4crs``-style not needed here) by inserting ``*``.
    """
    s = s.strip().rstrip(";")
    # digit or ')' immediately followed by '(' or a letter -> insert '*'
    s = re.sub(r"(\d|\))\s*(?=\()", r"\1*", s)
    s = re.sub(r"(\d|\))(?=[A-Za-z_])(?![eE][+-]?\d)", r"\1*", s)
    return s


def _eval_expr(s, env):
    return eval(_julia_expr_to_python(s), {"__builtins__": {}}, dict(env))


def _parse_bracket_array(text, name, env=()):
    """Parse ``name = [ ... ]`` (vector or ;-separated matrix) from text."""
    m = re.search(re.escape(name) + r"\s*=\s*\[", text)
    assert m, f"array {name} not found"
    start = m.end()
    end = text.index("]", start)
    body = text[start:end]
    env = dict(env)
    rows = [r.strip() for r in re.split(r";|\n", body) if r.strip()]
    out = []
    for row in rows:
        entries = [e for e in re.split(r"[,\s]+", row) if e]
        out.append([_eval_expr(e, env) for e in entries])
    arr = np.array(out, dtype=np.float64)
    if arr.shape[0] == 1:
        arr = arr[0]
    return arr


def _branches(body):
    """Split a function body into {p: branch_text} on `if p == N` chains."""
    marks = [(m.start(), int(m.group(1)))
             for m in re.finditer(r"(?:els)?if p == (\d+)", body)]
    els = re.search(r"\n\s*else\s*\n", body[marks[-1][0]:])
    end = marks[-1][0] + els.start() if els else len(body)
    out = {}
    for i, (pos, p) in enumerate(marks):
        nxt = marks[i + 1][0] if i + 1 < len(marks) else end
        out[p] = body[pos:nxt]
    return out


def _function_body(src, name):
    m = re.search(r"function " + re.escape(name) + r"\(p,", src)
    assert m, name
    end = src.index("#}}}", m.end())
    return src[m.end():end]


def _parse_indexed_assignments(text, name, shape):
    """Parse ``name[i, j] = value;`` assignments into a dense array."""
    arr = np.zeros(shape)
    for m in re.finditer(
            re.escape(name) + r"\[\s*(\d+),\s*(\d+)\]\s*=\s*([^;\n]+)", text):
        i, j = int(m.group(1)) - 1, int(m.group(2)) - 1
        arr[i, j] = _eval_expr(m.group(3), {})
    return arr


def _parse_linear_block(text, name, m_sz, nb):
    """Parse ``V_M0[i,j] = (V_M0[j,i] =)? expr(b1..bnb)`` into W[i,j,k]."""
    W = np.zeros((m_sz, m_sz, nb))
    seen = np.zeros((m_sz, m_sz), dtype=bool)
    unit = {f"b{k+1}": np.eye(nb)[k] for k in range(nb)}
    pat = re.compile(
        r"^\s*((?:" + re.escape(name) + r"\[\s*\d+,\s*\d+\]\s*=\s*)+)(.+)$")
    for line in text.splitlines():
        mm = pat.match(line)
        if not mm or name not in line:
            continue
        targets = re.findall(re.escape(name) + r"\[\s*(\d+),\s*(\d+)\]",
                             mm.group(1))
        coeffs = _eval_expr(mm.group(2), unit)
        coeffs = np.asarray(coeffs, dtype=np.float64)
        for (i, j) in targets:
            i, j = int(i) - 1, int(j) - 1
            W[i, j, :] = coeffs
            seen[i, j] = True
    assert seen.all(), f"{name}: missing entries {np.argwhere(~seen)}"
    return W


def main():
    src = open(REF).read()
    out = {}

    # ---- D1 --------------------------------------------------------------
    d1 = _function_body(src, "diagonal_sbp_D1")
    for p, br in _branches(d1).items():
        env = {}
        if "x1=" in br or "x1 =" in br:
            mx = re.search(r"x1\s*=\s*([0-9.]+)", br)
            env["x1"] = float(mx.group(1))
        bhinv = _parse_bracket_array(br, "bhinv", env)
        d = _parse_bracket_array(br, "d", env)
        bd = _parse_bracket_array(br, "bd", env)
        bd = np.atleast_2d(bd)
        out[f"d1_p{p}_bhinv"] = np.atleast_1d(bhinv)
        out[f"d1_p{p}_d"] = d
        out[f"d1_p{p}_bd"] = bd

    # ---- D2 (constant coefficient) --------------------------------------
    d2 = _function_body(src, "diagonal_sbp_D2")
    for p, br in _branches(d2).items():
        bhinv = np.atleast_1d(_parse_bracket_array(br, "bhinv"))
        d = _parse_bracket_array(br, "d")
        if p <= 6:
            if re.search(r"bd\s*=\s*d\b", br):  # p=2: bd aliases d
                bd = np.atleast_2d(d)
            else:
                bd = np.atleast_2d(_parse_bracket_array(br, "bd"))
            BS = _parse_bracket_array(br, "BS")
        elif p == 8:
            bd = _parse_indexed_assignments(br, "bd", (8, 12))
            BS = _parse_bracket_array(br, "BS")
        else:  # p == 10: bd is built from the M table, replicate construction
            M = _parse_indexed_assignments(br, "M", (11, 16))
            for k in range(1, 6):  # M[6+k, 12 .. 11+k] = -d[k-1::-1] (1-based)
                M[5 + k, 11:11 + k] = -d[:k][::-1]
            M[:11, :11] = M[:11, :11].T + M[:11, :11] - np.diag(np.diag(M[:11, :11]))
            BS = np.zeros(16)
            BS[:7] = -np.array([-49/20, 6, -15/2, 20/3, -15/4, 6/5, -1/6])
            e0 = np.zeros((11, 1)); e0[0] = 1
            bd = np.diag(bhinv) @ (-M + e0 @ BS[None, :])
        out[f"d2_p{p}_bhinv"] = bhinv
        out[f"d2_p{p}_d"] = d
        out[f"d2_p{p}_bd"] = bd
        out[f"d2_p{p}_BS"] = np.atleast_1d(np.ravel(BS))

    # ---- variable-coefficient D2 ----------------------------------------
    vd2 = src[src.index("function variable_diagonal_sbp_D2(p, N, B::AbstractArray"):]
    for p, br in _branches(vd2).items():
        out[f"vd2_p{p}_bhinv"] = np.atleast_1d(_parse_bracket_array(br, "bhinv"))
        out[f"vd2_p{p}_BS"] = np.atleast_1d(np.ravel(_parse_bracket_array(br, "BS")))
        if p == 2:
            continue  # interior/boundary formulas are hand-coded (tiny)
        m_sz, nb = (6, 8) if p == 4 else (9, 12)
        i0 = br.index("V_M0 = zeros"); i1 = br.index("I_M0")
        W0 = _parse_linear_block(br[i0:i1], "V_M0", m_sz, nb)
        i0 = br.index("V_MN = zeros"); i1 = br.index("I_MN")
        WN = _parse_linear_block(br[i0:i1], "V_MN", m_sz, nb)
        # far-end block must be the flip image of the near-end block
        assert np.array_equal(WN, W0[::-1, ::-1, :]), f"p={p} flip symmetry"
        out[f"vd2_p{p}_W0"] = W0

    path = "hybridsbp_tpu/ops1d/data/sbp_tables.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")
    for k in sorted(out):
        print(f"  {k}: shape {np.shape(out[k])}")


if __name__ == "__main__":
    main()
