"""Engine configuration.

Mirrors the *role* of exstruct's module-level detection config and
``set_table_detection_params`` (reference ``core/cells.py:38-43,
1384-1402``) but as an immutable dataclass that is broadcast to executors —
no process-global mutation (SURVEY.md §4 R10).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class DetectionConfig:
    """Table-candidate scoring thresholds.

    Parity: exstruct defaults score>=0.35, density>=0.05, coverage>=0.2,
    min_cells=3 (reference ``core/cells.py:38-43``); the composite score
    formula parity is with ``_table_signal_score`` (``core/cells.py:
    1350-1381``): density + 0.2*header + 0.1*(coverage>0.5) +
    0.1*structure.
    """

    min_score: float = 0.35
    min_density: float = 0.05
    min_coverage: float = 0.2
    min_cells: int = 3
    header_bonus: float = 0.2
    coverage_bonus: float = 0.1
    structure_bonus: float = 0.1
    # scan caps — parity with TableScanLimits max_rows=5000 max_cols=200
    # (reference core/cells.py:118-165); truncation is LOGGED, never silent.
    max_rows: int = 5000
    max_cols: int = 200
    # W3 parity: stop scanning after this many CONSECUTIVE all-empty rows
    # (the reference's empty-run early termination); truncation is logged
    max_empty_run: int = 200

    def with_params(self, **kw) -> "DetectionConfig":
        """Functional twin of exstruct's ``set_table_detection_params``."""
        return replace(self, **kw)


@dataclass(frozen=True)
class ExtractOptions:
    """Per-job extraction options (exstruct ``StructOptions`` analogue,
    reference ``engine.py:304-338,381-436``).  Controls which artifact
    families the fused extraction kernel emits."""

    include_tables: bool = True
    include_shapes: bool = True
    include_charts: bool = True
    include_lists: bool = True
    include_links: bool = True
    include_images: bool = True
    # embedded media pointers (iframe/video/audio/embed/object src) —
    # the multimodal-curation input a video/audio pipeline mines
    include_embeds: bool = True
    # region-scoped views (PrintAreaView analogue, reference
    # models/__init__.py:178-185,437-455) and class_map (colors_map
    # analogue, core/cells.py:277-310)
    include_sections: bool = True
    include_class_map: bool = True
    # schema.org structured data (JSON-LD + microdata) — author-declared
    # entities, the web analogue of the reference's typed models
    include_structured: bool = True
    # Excel-style alpha column keys in rows.c (reference col_index_to_alpha,
    # models/__init__.py:569-600; convert_workbook_keys_to_alpha 644-657)
    alpha_keys: bool = False
    # resolve relative hrefs against the doc url in links_map (S5 URL
    # resolution analogue, reference ooxml_drawing.py:863-921); off by
    # default so hrefs stay verbatim join keys
    absolutize_links: bool = False
    # canonicalize absolute hrefs (lowercase scheme/host, strip default
    # port + fragment, collapse dot segments — the _normalize_zip_path
    # analogue, ooxml_drawing.py:907-921); off by default, same reason
    normalize_links: bool = False
    # P7 parity: drop resolution/confidence/approximation_level from
    # arrows before serialization (reference _BACKEND_METADATA_CLEAR,
    # io/__init__.py:32-89 — provenance fields are backend-internal)
    scrub_backend_metadata: bool = False
    # boilerplate classifier thresholds (Boilerpipe/trafilatura-style;
    # the web analogue of exstruct's density/coverage gates)
    max_link_density: float = 0.333
    min_block_chars: int = 25
    # declared A1 print areas: each produces a PrintAreaView-shaped slice
    # of every table's rows (reference io/__init__.py:199-235,
    # models/__init__.py:437-455); normalize_areas re-bases r/c to the
    # area origin like the reference's ``normalize=True``
    print_areas: tuple = ()
    normalize_areas: bool = False
    # auto-derive areas from document structure: contiguous row bands of
    # each table split at empty-row gaps — the web analogue of the
    # reference's COM-computed auto_print_areas (page-break areas,
    # models/__init__.py:199-206, core/pipeline.py:677-744)
    auto_areas: bool = False
    detection: DetectionConfig = field(default_factory=DetectionConfig)

    @classmethod
    def from_mode(cls, mode: str, **overrides) -> "ExtractOptions":
        """Mode presets mirroring the reference's ExtractionMode dial
        (reference engine.py:260-277, shapes.py:115-126):

        * ``light``    — text + tables only (shapes/charts/lists/maps
          excluded, like the reference's always-exclude-shapes rule)
        * ``standard`` — every artifact family, provenance metadata
          SCRUBBED from arrows (note: the bare ``ExtractOptions()``
          dataclass defaults equal the ``verbose`` preset, not this one)
        * ``verbose``  — everything, including provenance fields on arrows

        ``overrides`` are applied on top of the preset.
        """
        if mode == "light":
            base = dict(
                include_shapes=False, include_charts=False,
                include_lists=False, include_links=False,
                include_images=False, include_embeds=False,
                include_sections=False, include_class_map=False,
                include_structured=False,
            )
        elif mode == "standard":
            base = dict(scrub_backend_metadata=True)
        elif mode == "verbose":
            base = {}
        else:
            raise ValueError(f"unknown extraction mode: {mode!r}")
        base.update(overrides)
        return cls(**base)
