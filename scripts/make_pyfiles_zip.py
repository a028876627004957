"""Package s2geography_spark into dist/s2geography_spark.zip for
spark-submit --py-files."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.makedirs(os.path.join(REPO, "dist"), exist_ok=True)
    dest = os.path.join(REPO, "dist", "s2geography_spark.zip")
    pkg = os.path.join(REPO, "s2geography_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    print(dest)


if __name__ == "__main__":
    main()
