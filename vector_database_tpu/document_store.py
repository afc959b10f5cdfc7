"""Document-scoped vector store — the SQL-engine layer, TPU-native.

Re-design of the reference's SQL product (reference DDL.sql):

- ``dbo.Document`` / ``dbo.Text`` (DDL.sql:302-326) become the
  ``DocumentStore``'s document registry and per-document text/vector rows;
- ``dbo.IndexDocument`` (DDL.sql:352-419) becomes ``index_document``:
  (re)build the document's index and atomically replace the stored one
  (the delete + bulk-insert at DDL.sql:397-418);
- ``dbo.TextIndex`` durability (DDL.sql:209-227) becomes ``save``/``load``
  of the flat node tables (one npz per document + a JSON manifest);
- ``dbo.Search`` (DDL.sql:234-295) becomes ``search``: ε-proximity over one
  document or all of them. The reference returns an unverified axis-box
  candidate set (exactness is the caller's job); here ``exact=True``
  (default) reranks on device, ``exact=False`` reproduces the raw
  candidate-superset contract.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from vector_database_tpu.builder import build_index_fused
from vector_database_tpu.models.bsp import BSPIndex
from vector_database_tpu.search import search as bsp_search


@dataclass
class _Document:
    doc_id: int
    name: str
    text_ids: List[int] = field(default_factory=list)
    texts: List[Optional[str]] = field(default_factory=list)
    vectors: List[np.ndarray] = field(default_factory=list)
    index: Optional[BSPIndex] = None
    dirty: bool = True  # texts changed since last index_document


class DocumentStore:
    """Documents -> texts (with vectors) -> per-document BSP indexes."""

    def __init__(self, leaf_size: int = 8):
        self._docs: Dict[int, _Document] = {}
        self._next_doc = 1
        self._next_text = 1
        self._leaf_size = leaf_size

    # --- dbo.Document ----------------------------------------------------
    def create_document(self, name: str = "") -> int:
        doc_id = self._next_doc
        self._next_doc += 1
        self._docs[doc_id] = _Document(doc_id, name)
        return doc_id

    def delete_document(self, doc_id: int) -> None:
        """Cascade delete: texts and index go with the document
        (the FK cascades at DDL.sql:332-344)."""
        del self._docs[doc_id]

    @property
    def documents(self) -> List[Tuple[int, str]]:
        return [(d.doc_id, d.name) for d in self._docs.values()]

    # --- dbo.Text ----------------------------------------------------------
    def add_text(
        self,
        doc_id: int,
        vector,
        text: Optional[str] = None,
        text_id: Optional[int] = None,
    ) -> int:
        doc = self._docs[doc_id]
        if text_id is None:
            text_id = self._next_text
        self._next_text = max(self._next_text, text_id + 1)
        vec = np.asarray(vector, dtype=np.float32)
        if doc.vectors and vec.shape != doc.vectors[0].shape:
            raise ValueError("invalid vector size")
        doc.text_ids.append(text_id)
        doc.texts.append(text)
        doc.vectors.append(vec)
        doc.dirty = True
        return text_id

    def get_text(self, doc_id: int, text_id: int):
        doc = self._docs[doc_id]
        i = doc.text_ids.index(text_id)
        return doc.texts[i], doc.vectors[i]

    # --- dbo.IndexDocument --------------------------------------------------
    def index_document(self, doc_id: int) -> None:
        """(Re)build the document's index and atomically swap it in
        (DDL.sql:388-418)."""
        doc = self._docs[doc_id]
        if not doc.vectors:
            doc.index = None
            doc.dirty = False
            return
        matrix = np.stack(doc.vectors)
        doc.index = build_index_fused(matrix, leaf_size=self._leaf_size)
        doc.dirty = False

    # --- dbo.Search ----------------------------------------------------------
    def search(
        self,
        point,
        domain: float,
        doc_id: Optional[int] = None,
        *,
        exact: bool = True,
        auto_index: bool = True,
    ) -> List[Tuple[int, int, float]]:
        """ε-proximity search; returns ``(doc_id, text_id, sq_dist)`` rows.

        ``doc_id=None`` searches every document (DDL.sql:241-242,262-263).
        ``exact=False`` returns the raw candidate superset with
        ``sq_dist = nan`` — the reference contract, where verification is
        the caller's job (README.md:72). Stale (dirty) documents are
        reindexed on demand when ``auto_index``.
        """
        point = np.asarray(point, dtype=np.float32)
        targets = (
            [self._docs[doc_id]] if doc_id is not None
            else list(self._docs.values())
        )
        out: List[Tuple[int, int, float]] = []
        for doc in targets:
            if doc.dirty and auto_index:
                self.index_document(doc.doc_id)
            if doc.index is None:
                continue
            res = bsp_search(doc.index, point, domain)
            if exact:
                rows = np.asarray(res.rows[0])
                d2 = np.asarray(res.sq_dists[0])
                for r, dd in zip(rows, d2):
                    if r >= 0:
                        out.append(
                            (doc.doc_id, doc.text_ids[int(r)], float(dd))
                        )
            else:
                # raw candidate superset (the recursive CTE's contract:
                # verification is the caller's job, DDL.sql:295)
                cand = np.asarray(res.cand_rows[0])
                for r in cand[cand >= 0]:
                    out.append(
                        (doc.doc_id, doc.text_ids[int(r)], float("nan"))
                    )
        return out

    # --- persistence (dbo.TextIndex durability) ----------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        manifest = {
            "next_doc": self._next_doc,
            "next_text": self._next_text,
            "leaf_size": self._leaf_size,
            "documents": [],
        }
        for doc in self._docs.values():
            entry = {
                "doc_id": doc.doc_id,
                "name": doc.name,
                "text_ids": doc.text_ids,
                "texts": doc.texts,
                "dirty": doc.dirty,
                "has_index": doc.index is not None,
            }
            np.savez_compressed(
                os.path.join(path, f"doc_{doc.doc_id}_vectors.npz"),
                vectors=np.stack(doc.vectors) if doc.vectors
                else np.zeros((0, 0), np.float32),
            )
            if doc.index is not None:
                doc.index.save(os.path.join(path, f"doc_{doc.doc_id}_index"))
            manifest["documents"].append(entry)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @classmethod
    def load(cls, path: str) -> "DocumentStore":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        store = cls(leaf_size=manifest["leaf_size"])
        store._next_doc = manifest["next_doc"]
        store._next_text = manifest["next_text"]
        for entry in manifest["documents"]:
            doc = _Document(entry["doc_id"], entry["name"])
            doc.text_ids = list(entry["text_ids"])
            doc.texts = list(entry["texts"])
            z = np.load(
                os.path.join(path, f"doc_{doc.doc_id}_vectors.npz")
            )
            vecs = z["vectors"]
            doc.vectors = [vecs[i] for i in range(vecs.shape[0])]
            if entry["has_index"]:
                doc.index = BSPIndex.load(
                    os.path.join(path, f"doc_{doc.doc_id}_index.npz")
                )
            doc.dirty = entry["dirty"]
            store._docs[doc.doc_id] = doc
        return store
