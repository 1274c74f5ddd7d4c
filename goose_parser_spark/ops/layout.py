"""PDF / layout parsing plumbing (north rule: "PDF/layout parse").

No PDF library exists in this container, so the codec is STUBBED the
same way as the image/audio decoders in ops/multimodal.py: the
Spark-side plumbing — binary column in, per-page text rows out,
Arrow batching, failure isolation — is real and tested;
:func:`parse_pdf_stub` raises ``NotImplementedError`` unless
``fake=True``, in which case it deterministically fakes page splits
so the pipeline shape can be exercised end to end. Swapping in
pdfminer/pypdf on a real cluster is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def parse_pdf_stub(data: bytes, fake: bool = True) -> list[str]:
    """STUB PDF parser → list of page texts.

    ``fake=True``: deterministic fake pagination — the byte payload is
    decoded latin-1 and split into 512-byte "pages" (stable across
    runs/engines). Otherwise raises: plug a real parser here.
    """
    if not fake:
        raise NotImplementedError(
            "no PDF parser in this container; pass fake=True or swap "
            "in pdfminer/pypdf")
    text = data.decode("latin-1")
    page_size = 512
    return [text[i:i + page_size] for i in range(0, max(len(text), 1), page_size)]


def extract_pdf_pages(
    df: "DataFrame",
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Binary PDF payloads → one row per (doc, page_no, page_text).

    The explode happens inside the Python worker (a parsed page list
    never crosses the boundary twice); output rows are narrow.
    """
    from goose_parser_spark.deploy import ship_package
    ship_package(df.sparkSession)

    out_schema = StructType([
        df.schema[id_col],
        StructField("page_no", IntegerType(), False),
        StructField("page_text", StringType(), True),
        StructField("n_pages", IntegerType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[object] = []
            page_nos: list[int] = []
            texts: list[str] = []
            n_pages_col: list[int] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                pages = parse_pdf_stub(bytes(payload))
                for pno, ptext in enumerate(pages):
                    ids.append(doc_id)
                    page_nos.append(pno)
                    texts.append(ptext)
                    n_pages_col.append(len(pages))
            yield pd.DataFrame({
                id_col: pd.Series(ids),
                "page_no": pd.Series(page_nos, dtype="int32"),
                "page_text": pd.Series(texts, dtype="object"),
                "n_pages": pd.Series(n_pages_col, dtype="int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
