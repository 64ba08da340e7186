"""LaTeX source → plain text — from scratch, stdlib regexes.

arXiv is a first-tier LLM training source and it ships TeX, not PDF:
a text-extraction lane needs a deterministic de-TeXer.  The strip,
in order (each step a bounded regex pass — no TeX macro expansion,
which would be untrusted computation):

1. verbatim environments stashed first (their bytes are literal and
   must survive every later pass);
2. comments (``%`` to end of line, ``\\%`` escapes respected);
3. the ``\\begin{document}`` body when present (preamble dropped);
4. math dropped: ``$...$``, ``$$...$$``, ``\\[...\\]``, and the
   equation/align/gather/eqnarray/math/displaymath/multline
   environments;
5. figure/table environments reduced to their ``\\caption{...}``
   texts (the caption is training text, the float plumbing is not);
6. argument-keeping text commands unwrapped (section heads, emphasis,
   footnotes, \\text/\\mbox, ...), iterated for nesting;
7. argument-dropping commands removed with their arguments
   (\\cite/\\ref/\\label/\\includegraphics/\\usepackage/...);
8. structure tokens: ``\\item``/``\\par``/``\\\\`` → newline, ``~`` →
   space, the 7 special-char escapes unescaped, common accent
   commands folded to their letters;
9. leftover ``\\begin{...}``/``\\end{...}``/unknown commands dropped,
   braces removed, whitespace collapsed.

``latex_to_text`` is pure-Python per payload (the codec boundary —
rides document_extract's mapInPandas pass); the q_latex gate pins the
chain against a directly-constructed oracle, the q_markdown pattern.

Reference parity note: the reference (SummaryDev/evm-archive) has no
document surface; this extends the text-extraction lane to TeX
corpora."""

from __future__ import annotations

import re

MAX_TEX_BYTES = 16 * 1024 * 1024

_MATH_ENVS = r"(?:equation|align|eqnarray|gather|math|displaymath|multline)"
_KEEP_CMDS = (
    r"(?:section|subsection|subsubsection|paragraph|chapter|title|"
    r"author|date|textbf|textit|textrm|textsf|emph|underline|texttt|"
    r"textsc|footnote|caption|mbox|text|uppercase|lowercase)"
)
_DROP_CMDS = (
    r"(?:documentclass|usepackage|label|cite|citep|citet|ref|eqref|"
    r"pageref|includegraphics|bibliographystyle|bibliography|input|"
    r"include|pagestyle|thispagestyle|vspace|hspace|setlength|"
    r"newcommand|renewcommand|def)"
)
_ACCENTS = {
    "'e": "\u00e9", "'a": "\u00e1", "'o": "\u00f3", "'u": "\u00fa",
    "'i": "\u00ed", "`e": "\u00e8", "`a": "\u00e0", '"u': "\u00fc",
    '"o': "\u00f6", '"a': "\u00e4", "^e": "\u00ea", "~n": "\u00f1",
    "c c": "\u00e7",
}


class LatexError(ValueError):
    """Malformed or out-of-scope TeX payload."""


def is_latex(text: str) -> bool:
    head = text[:4096]
    return "\\documentclass" in head or "\\begin{document}" in head


def latex_to_text(src: str) -> str:
    """Deterministic de-TeX of one source file (see module doc for
    the pass order)."""
    if len(src) > MAX_TEX_BYTES:
        raise LatexError("TeX source over cap")
    s = src.replace("\r\n", "\n").replace("\r", "\n")

    # 1. verbatim content preserved via placeholders FIRST — its
    # bytes are literal and must survive the comment/math passes
    stash: list[str] = []

    def _keep(text: str) -> str:
        stash.append(text)
        return f"\x00{len(stash) - 1}\x00"

    s = re.sub(r"\\begin\{verbatim\}([\s\S]*?)\\end\{verbatim\}",
               lambda mo: _keep(mo.group(1)), s)
    s = re.sub(r"\\verb(.)(.*?)\1",
               lambda mo: _keep(mo.group(2)), s)

    # 2. comments (keep \% escapes)
    s = re.sub(r"(?<!\\)%[^\n]*", "", s)

    # 3. document body
    m = re.search(r"\\begin\{document\}([\s\S]*?)(\\end\{document\}|\Z)",
                  s)
    if m:
        s = m.group(1)

    # 4. math
    s = re.sub(r"\$\$[\s\S]*?\$\$", " ", s)
    s = re.sub(r"(?<!\\)\$[^$\n]*\$", " ", s)
    s = re.sub(r"\\\[[\s\S]*?\\\]", " ", s)
    s = re.sub(
        r"\\begin\{(" + _MATH_ENVS + r")\*?\}[\s\S]*?\\end\{\1\*?\}",
        " ", s)

    # 5. floats reduced to captions
    def _float(mo: re.Match) -> str:
        caps = re.findall(r"\\caption(?:\[[^\]]*\])?\{([^{}]*)\}",
                          mo.group(0))
        return "\n" + "\n".join(caps) + "\n" if caps else " "

    s = re.sub(r"\\begin\{(figure|table)\*?\}[\s\S]*?\\end\{\1\*?\}",
               _float, s)

    # 6. argument-keeping commands (iterate for nesting)
    keep = re.compile(r"\\" + _KEEP_CMDS + r"\*?(?:\[[^\]]*\])?"
                      r"\{([^{}]*)\}")
    for _ in range(8):
        s, n = keep.subn(lambda mo: "\n" + mo.group(1) + "\n"
                         if mo.group(0).startswith(
                             ("\\section", "\\subsection",
                              "\\subsubsection", "\\paragraph",
                              "\\chapter", "\\title", "\\caption"))
                         else mo.group(1), s)
        if not n:
            break

    # 7. argument-dropping commands
    s = re.sub(r"\\" + _DROP_CMDS + r"\*?(?:\[[^\]]*\])?"
               r"(?:\{[^{}]*\})*", " ", s)

    # 8. structure tokens, escapes, accents
    for tex, ch in _ACCENTS.items():
        s = s.replace("\\" + tex + "{}", ch)
        s = re.sub(r"\\" + re.escape(tex[0]) + r"\{"
                   + re.escape(tex[1:].strip()) + r"\}", ch, s)
        if " " not in tex:                       # bare \'e form
            s = s.replace("\\" + tex, ch)
    s = re.sub(r"\\(item|par)\b", "\n", s)
    s = s.replace("\\\\", "\n")
    s = re.sub(r"(?<!\\)~", " ", s)
    s = re.sub(r"\\([%$&_#{}])", r"\1", s)

    # 9. leftovers
    s = re.sub(r"\\(begin|end)\{[^{}]*\}", " ", s)
    s = re.sub(r"\\[a-zA-Z]+\*?(?:\[[^\]]*\])?", " ", s)
    s = re.sub(r"[{}]", "", s)

    # whitespace discipline: collapse spaces, trim line edges, squeeze
    # blank runs (BEFORE restoring verbatim, whose bytes are literal)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{2,}", "\n", s)
    s = s.strip()
    for i, blob in enumerate(stash):
        s = s.replace(f"\x00{i}\x00", blob)
    return s
