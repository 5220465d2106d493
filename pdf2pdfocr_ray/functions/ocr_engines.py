"""Pluggable OCR engine slot for the T1 actor pool.

The reference selects its OCR engine by name (`-c tesseract|cuneiform|
no_ocr`, /root/reference/pdf2pdfocr.py:104-207, 556-558) and probes its
capabilities at startup.  The Ray mapping keeps the same shape but makes
the slot a real interface: `OcrStage` resolves `PipelineConfig.ocr_engine`
through this module, so a MODEL-BACKED engine (pytesseract, easyocr, a
fine-tuned recognizer...) drops in without touching the stage:

* ``"template"`` / ``"template_retry"`` / ``"no_ocr"`` — the built-ins.
* ``"external:<module>:<attr>"`` — load ``<attr>`` from ``<module>``
  ONCE PER ACTOR (inside the map_batches ``__init__``), never pickled
  through the object store or re-shipped per batch — the scale-correct
  pattern for a multi-GB model on a 256-node pool.  ``<attr>`` may be a
  zero-arg factory returning the engine, or the engine itself; the engine
  is ``recognize(img, scale) -> lines`` or any object with a
  ``recognize`` / ``predict`` / ``__call__`` method.
* any name registered via :func:`register_ocr_engine` — for engines a
  deployment wires up in a module its workers import.

Engine output is coerced from any of the common shapes (``LineBox``
lists, ``{"text", "x1".."y2"}`` dicts, ``(text, x1, y1, x2, y2)``
tuples, or bare strings) into the ``LineBox``/``WordBox`` structure the
hOCR emitter consumes, so an adapter only has to hand back text + boxes.

``demo_model`` is the in-repo stand-in for a real external model (the
container has no tesseract): a factory whose "weights load" is the glyph
template table, demonstrating the full external-engine path end-to-end.
"""

from __future__ import annotations

import importlib
from typing import Callable, Iterable

import numpy as np

from .ocr_core import LineBox, WordBox, recognize_page


class OcrEngineError(ValueError):
    """Unknown / unloadable engine: raised at ACTOR INIT (T3 fail-fast,
    reference capability probe pdf2pdfocr.py:1180-1205)."""


def coerce_lines(result: object) -> list[LineBox]:
    """Normalize an external engine's page result to ``list[LineBox]``."""
    if result is None:
        return []
    if not isinstance(result, Iterable) or isinstance(result, (str, bytes)):
        raise ValueError(f"engine returned non-iterable page result: {type(result)}")
    lines: list[LineBox] = []
    for item in result:
        if isinstance(item, LineBox):
            lines.append(item)
            continue
        if isinstance(item, dict):
            text = str(item.get("text", ""))
            x1 = int(item.get("x1", 0))
            y1 = int(item.get("y1", 0))
            x2 = int(item.get("x2", x1))
            y2 = int(item.get("y2", y1))
        elif isinstance(item, (tuple, list)) and len(item) >= 5:
            text, x1, y1, x2, y2 = (
                str(item[0]), int(item[1]), int(item[2]), int(item[3]), int(item[4])
            )
        elif isinstance(item, str):
            text, x1, y1, x2, y2 = item, 0, 0, 0, 0
        else:
            raise ValueError(f"unrecognized engine line shape: {type(item)}")
        line = LineBox()
        # split on spaces so hOCR gets word-level boxes; x-extent is
        # apportioned linearly when the engine gave only a line box
        words = text.split(" ") if text else []
        if not words:
            continue
        total = sum(len(w) for w in words) + len(words) - 1
        cursor = x1
        for w in words:
            frac = (len(w) / total) if total else 1.0
            wx2 = min(x2, int(round(cursor + frac * (x2 - x1))))
            line.words.append(WordBox(w, int(cursor), y1, max(int(cursor), wx2), y2))
            cursor = wx2 + max(1, (x2 - x1) // max(total, 1))
        lines.append(line)
    return lines


class TemplateEngine:
    """The built-in deterministic template matcher as an engine object."""

    name = "template"
    # recognize() IS recognize_page, so the full-page verification pass
    # normalize_page_full already ran can stand in for it (identical by
    # construction); OcrStage skips the duplicate recognition.
    reuse_normalized_lines = True

    def __init__(self) -> None:
        from . import font5x7

        self._templates = font5x7._TEMPLATES  # warm the glyph table

    def recognize(self, img: np.ndarray, scale: int) -> list[LineBox]:
        return recognize_page(img, scale)


def _is_zero_arg(fn) -> bool:
    """True when ``fn`` can be called with no arguments (a factory);
    False when it requires positionals (a bare recognize(img, scale)).
    Unintrospectable callables (C builtins) are treated as bare."""
    import inspect

    try:
        sig = inspect.signature(fn)
    except (ValueError, TypeError):
        return False
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD) and (
            p.default is p.empty
        ):
            return False
        if p.kind is p.KEYWORD_ONLY and p.default is p.empty:
            return False
    return True


class ExternalModelEngine:
    """Adapter for a real model-backed OCR engine addressed as
    ``external:<module>:<attr>``.

    The import and any model construction happen HERE — i.e. inside the
    OcrStage actor's ``__init__`` — so each pool worker loads its own
    copy exactly once and nothing heavy crosses the object store.  A
    pytesseract adapter is one module:

        # myocr.py (on the cluster's worker image)
        def engine():
            import pytesseract          # heavy import, once per actor
            def recognize(img, scale):
                data = pytesseract.image_to_data(img, output_type=dict)
                return [
                    {"text": t, "x1": l, "y1": tp, "x2": l + w, "y2": tp + h}
                    for t, l, tp, w, h in zip(
                        data["text"], data["left"], data["top"],
                        data["width"], data["height"]) if t.strip()
                ]
            return recognize

    then ``ocr_engine="external:myocr:engine"``.
    """

    def __init__(self, path: str) -> None:
        mod_name, _, attr = path.rpartition(":")
        if not mod_name or not attr:
            raise OcrEngineError(
                f"external engine path {path!r} must be '<module>:<attr>'"
            )
        try:
            obj = getattr(importlib.import_module(mod_name), attr)
        except (ImportError, AttributeError) as exc:
            raise OcrEngineError(f"cannot load external engine {path!r}: {exc}")
        # zero-arg factory -> engine; else the object IS the engine.
        # Decide by SIGNATURE, not by catching TypeError from the call —
        # a factory whose body legitimately raises TypeError must fail
        # HERE (actor init, the T3 fail-fast point), not per-page later.
        if callable(obj) and not hasattr(obj, "recognize") and not hasattr(obj, "predict"):
            if _is_zero_arg(obj):
                obj = obj()
        self._fn = (
            getattr(obj, "recognize", None)
            or getattr(obj, "predict", None)
            or obj
        )
        if not callable(self._fn):
            raise OcrEngineError(f"external engine {path!r} is not callable")
        self.name = path

    def recognize(self, img: np.ndarray, scale: int) -> list[LineBox]:
        return coerce_lines(self._fn(img, scale))


class _CallableEngine:
    """A bare ``fn(img, scale) -> lines`` callable wrapped as an engine."""

    def __init__(self, name: str, fn: Callable) -> None:
        self.name = name
        self._fn = fn

    def recognize(self, img: np.ndarray, scale: int) -> list[LineBox]:
        return coerce_lines(self._fn(img, scale))


_REGISTRY: dict[str, Callable[[], object]] = {}


def register_ocr_engine(name: str, factory: Callable[[], object]) -> None:
    """Register an engine factory under ``name``.  Registration is
    per-process: for it to be visible inside pool actors, call it at
    import time of a module the workers import (or use the
    ``external:module:attr`` form, which resolves inside the actor)."""
    _REGISTRY[name] = factory


def resolve_ocr_engine(name: str):
    """Engine name -> engine object with ``recognize(img, scale)``.
    ``template_retry`` and ``no_ocr`` are stage-level behaviors; the
    stage maps them to the template engine / no engine before calling
    this."""
    if name in ("template", "template_retry"):
        return TemplateEngine()
    if name in _REGISTRY:
        eng = _REGISTRY[name]()
        if hasattr(eng, "recognize"):
            return eng
        if callable(eng):
            return _CallableEngine(name, eng)
        raise OcrEngineError(f"registered engine {name!r} is not an engine")
    if name.startswith("external:"):
        return ExternalModelEngine(name[len("external:"):])
    raise OcrEngineError(
        f"unknown ocr_engine {name!r} (builtins: template, template_retry, "
        "no_ocr; plug in a model with 'external:<module>:<attr>' or "
        "register_ocr_engine)"
    )


def demo_model():
    """Factory for the in-repo EXTERNAL-ENGINE demo: stands in for a real
    model where the "weights" are the glyph template table.  Returns an
    object with ``predict`` (not ``recognize``) yielding dict lines, so
    the adapter's coercion path is exercised for real."""

    class _DemoModel:
        def __init__(self) -> None:
            self._engine = TemplateEngine()  # "load weights"

        def predict(self, img: np.ndarray, scale: int) -> list[dict]:
            out = []
            for line in self._engine.recognize(img, scale):
                b = line.bbox
                out.append(
                    {"text": line.text, "x1": b[0], "y1": b[1], "x2": b[2], "y2": b[3]}
                )
            return out

    return _DemoModel()
