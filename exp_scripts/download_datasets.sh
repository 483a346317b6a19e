#!/bin/bash
# Download the big-ann-benchmarks 1B datasets (parity with the reference's
# exp_scripts/download_datasets.sh; same public URLs).
# Usage: ./download_datasets.sh <target-dir> [dataset ...]
set -euo pipefail

TARGET=${1:-./data}
shift || true
DATASETS=${@:-deep}
mkdir -p "$TARGET"
cd "$TARGET"

fetch() { # url dest
  if [ ! -f "$2" ]; then
    echo "downloading $2"
    curl -L --retry 5 -o "$2" "$1"
  fi
}

for ds in $DATASETS; do
  case $ds in
    deep)
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/DEEP/base.1B.fbin deep_base1B.fbin
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/DEEP/query.public.10K.fbin deep_query.fbin
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/deep_new_groundtruth.public.10K.bin deep_gt.bin
      ;;
    text-to-image)
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/T2I/base.1B.fbin text-to-image_base1B.fbin
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/T2I/query.public.100K.fbin text-to-image_query.fbin
      fetch https://storage.yandexcloud.net/yandex-research/ann-datasets/t2i_new_groundtruth.public.100K.bin text-to-image_gt.bin
      ;;
    turing)
      fetch https://comp21storage.z5.web.core.windows.net/comp21/MSFT-TURING-ANNS/base1b.fbin turing_base1B.fbin
      fetch https://comp21storage.z5.web.core.windows.net/comp21/MSFT-TURING-ANNS/query100K.fbin turing_query.fbin
      fetch https://comp21storage.z5.web.core.windows.net/comp21/MSFT-TURING-ANNS/query_gt100.bin turing_gt.bin
      ;;
    sift1B)
      echo "sift1B: download base.1B.u8bin + queries from big-ann-benchmarks (bigann)"
      fetch https://dl.fbaipublicfiles.com/billion-scale-ann-benchmarks/bigann/base.1B.u8bin sift1B_base1B.u8bin
      fetch https://dl.fbaipublicfiles.com/billion-scale-ann-benchmarks/bigann/query.public.10K.u8bin sift1B_query.u8bin
      ;;
    spacev)
      echo "spacev: see https://github.com/microsoft/SPTAG/tree/main/datasets/SPACEV1B"
      ;;
    *)
      echo "unknown dataset $ds" >&2; exit 1;;
  esac
done
