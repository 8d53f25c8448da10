"""Driver-side acquisition utilities (SURVEY §2.1 S5, S8, S9).

Download + unzip stay on the driver exactly as in the reference
(SURVEY S8/S9 note: Spark reads zips only via binaryFile+UDF — not
worth it for a one-time acquisition step). Parquet metadata
inspection (S5) reads only the footer.
"""

from __future__ import annotations

import os
import zipfile
from typing import Any
from urllib.request import urlopen

ZENODO_API = "https://zenodo.org/api/records"


def download_from_zenodo(
    record_id: str, file_name: str, dest_folder: str
) -> str:
    """S8: fetch one file of a Zenodo record, skipping the download
    when the target already exists (``zenodo_client.py:44-50``).
    Network access happens only on a cache miss."""
    os.makedirs(dest_folder, exist_ok=True)
    dest = os.path.join(dest_folder, file_name)
    if os.path.exists(dest):
        return dest
    import json

    with urlopen(f"{ZENODO_API}/{record_id}") as resp:  # noqa: S310
        record = json.load(resp)
    url = next(
        f["links"]["self"]
        for f in record["files"]
        if f["key"] == file_name
    )
    tmp = dest + ".part"
    with urlopen(url) as resp, open(tmp, "wb") as out:  # noqa: S310
        while chunk := resp.read(1 << 20):
            out.write(chunk)
    os.rename(tmp, dest)
    return dest


def unzip_folders(
    zip_path: str,
    target_folder: str | None = None,
    folder_names: list[str] | None = None,
) -> list[str]:
    """S9: selective zip extraction — only members under the named
    top-level folders, everything when ``folder_names`` is empty
    (``file_utils.py:62-112``). Returns extracted member names."""
    target = target_folder or os.path.dirname(os.path.abspath(zip_path))
    wanted = folder_names or []
    extracted: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            if member.endswith("/"):
                continue
            if wanted and not any(
                f"/{name}/" in f"/{member}" or member.startswith(f"{name}/")
                for name in wanted
            ):
                continue
            zf.extract(member, target)
            extracted.append(member)
    return extracted


def get_parquet_info(path: str) -> dict[str, Any]:
    """S5: footer-only Parquet inspection (``get_parquet_info``,
    ``data_transformer.py:86-119``): rows, columns, row groups,
    physical types, compressed/uncompressed sizes — no data read."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    first_rg = md.row_group(0) if md.num_row_groups else None
    return {
        "num_rows": md.num_rows,
        "num_columns": md.num_columns,
        "num_row_groups": md.num_row_groups,
        "serialized_footer_bytes": md.serialized_size,
        "columns": {
            md.schema.column(i).name: md.schema.column(i).physical_type
            for i in range(md.num_columns)
        },
        "row_group_0_bytes": (
            first_rg.total_byte_size if first_rg else 0
        ),
    }


def create_directories_from_yaml(
    structure: "dict | None", base_path: str = "."
) -> list[str]:
    """First-run project scaffolding: create the nested directory
    tree a ``project_structure`` config section describes (the
    reference's ``FileUtils.create_directories_from_yaml``,
    ``src/utility/file_utils.py:288-315``, driven by
    ``config/project_structure_config.yaml``). Keys are directory
    names, dict values recurse, empty/None values are leaves; any
    directory whose path contains a ``src`` segment gets an
    ``__init__.py`` package marker, matching the reference's rule.

    Pure driver-side filesystem setup (no Spark). Returns the list
    of directories created-or-confirmed, depth-first, for logging
    and tests.
    """
    made: list[str] = []

    def _walk(node: "dict | None", cur: str) -> None:
        if not isinstance(node, dict):
            return
        for key, value in node.items():
            path = os.path.join(cur, str(key))
            os.makedirs(path, exist_ok=True)
            made.append(path)
            # the reference checks `"src" in new_path` (substring);
            # match on the path SEGMENT instead so e.g. `resources/`
            # doesn't get a stray __init__.py
            if "src" in os.path.normpath(path).split(os.sep):
                init = os.path.join(path, "__init__.py")
                if not os.path.exists(init):
                    with open(init, "w") as f:
                        f.write(
                            "# This file makes this directory"
                            " a Python package\n"
                        )
            _walk(value, path)

    _walk(structure, base_path)
    return made
