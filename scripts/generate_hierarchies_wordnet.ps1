# WordNet wnid + hierarchy generation (PowerShell equivalent of
# generate_hierarchies_wordnet.sh).

python -c "from nbdt_tpu.hierarchy.wnid import maybe_install_wordnet; maybe_install_wordnet()"

foreach ($dataset in @("CIFAR10", "CIFAR100")) {
  python -m nbdt_tpu.bin.nbdt_wnids --dataset=$dataset
}

foreach ($dataset in @("CIFAR10", "CIFAR100", "TinyImagenet200")) {
  python -m nbdt_tpu.bin.nbdt_hierarchy --dataset=$dataset --method=wordnet --force
}
