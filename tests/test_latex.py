"""LaTeX → plain text (ops/latex.py)."""
from __future__ import annotations

import random
import time

from goose_parser_spark.ops.latex import latex_to_text


def test_sectioning_and_math():
    s = r"\section{Intro} We study $x^2+y$ systems."
    assert latex_to_text(s) == "Intro\nWe study systems."
    assert latex_to_text(r"\[display\] kept \(inline\) also") == \
        "kept also"
    assert latex_to_text("a $$d^2$$ b") == "a b"


def test_keep_drop_and_unknown_commands():
    assert latex_to_text(
        r"\emph{bold} and \unknowncmd{kept} text % comment") == \
        "bold and kept text"
    assert latex_to_text(
        r"\includegraphics[width=3cm]{fig.png}caption") == "caption"
    assert latex_to_text(r"A\footnote{aside}B \cite{x} C") == "AB C"


def test_environments():
    s = (r"\begin{equation}e=mc^2\end{equation}Before "
         r"\begin{itemize}\item X\end{itemize} after "
         r"\begin{figure}\includegraphics{f}\caption{gone}"
         r"\end{figure}done")
    assert latex_to_text(s) == "Before X after done"


def test_escapes_and_nested_braces():
    assert latex_to_text(r"50\% of \{braces\} \_u\_ \#1 \$2") == \
        "50% of {braces} _u_ #1 $2"
    assert latex_to_text(r"\textbf{outer \emph{inner} tail}") == \
        "outer inner tail"


def test_linebreaks_and_ties():
    assert latex_to_text("C~D \\\\ E") == "C D\nE"


def test_fuzz_linear_and_no_crash():
    rnd = random.Random(5)
    t0 = time.monotonic()
    latex_to_text("{" * 200_000)
    latex_to_text("\\begin{equation}" * 20_000)
    latex_to_text("$" * 100_001)
    latex_to_text("\\" * 100_000)
    for n in (0, 17, 4096):
        latex_to_text("".join(chr(rnd.randrange(32, 127))
                              for _ in range(n)))
    assert time.monotonic() - t0 < 15


def test_latex_clean_spark_op(spark):
    from goose_parser_spark.ops.latex import latex_clean
    df = spark.createDataFrame(
        [(1, r"\title{T} body $m$ and $n$."), (2, None)],
        "doc_id long, tex string")
    rows = {r.doc_id: r for r in latex_clean(df).collect()}
    assert rows[1].clean_text == "T\nbody and ."
    assert rows[1].n_math == 2
    assert 2 not in rows
