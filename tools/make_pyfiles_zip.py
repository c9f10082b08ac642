"""Build dist/datashare_extension_neo4j_spark.zip for
spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "datashare_extension_neo4j_spark"


def main() -> str:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "datashare_extension_neo4j_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(PKG.rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
