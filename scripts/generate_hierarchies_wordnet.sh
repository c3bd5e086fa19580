#!/usr/bin/env bash
# WordNet wnid + hierarchy generation (reference
# scripts/generate_hierarchies_wordnet.sh equivalent). Requires the NLTK
# WordNet corpus; nbdt-wnids degrades to FakeSynsets without it.
set -euo pipefail

python -c "from nbdt_tpu.hierarchy.wnid import maybe_install_wordnet; maybe_install_wordnet()"

# Generate WNIDs
for dataset in CIFAR10 CIFAR100; do
  python -m nbdt_tpu.bin.nbdt_wnids --dataset="${dataset}"
done

# Generate and test hierarchies
for dataset in CIFAR10 CIFAR100 TinyImagenet200; do
  python -m nbdt_tpu.bin.nbdt_hierarchy --dataset="${dataset}" --method=wordnet --force
done
