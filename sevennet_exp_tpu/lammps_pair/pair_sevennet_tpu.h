// Header for the SevenNet-TPU LAMMPS pair style scaffold
// (see pair_sevennet_tpu.cpp for status and integration steps).
#ifdef PAIR_CLASS
// clang-format off
PairStyle(sevennet_tpu, PairSevenNetTPU);
// clang-format on
#else

#ifndef LMP_PAIR_SEVENNET_TPU_H
#define LMP_PAIR_SEVENNET_TPU_H

#include <vector>

#include "pair.h"

namespace LAMMPS_NS {

class PairSevenNetTPU : public Pair {
 public:
  PairSevenNetTPU(class LAMMPS*);
  ~PairSevenNetTPU() override;
  void compute(int, int) override;
  void settings(int, char**) override;
  void coeff(int, char**) override;
  void init_style() override;

 protected:
  void allocate();

 private:
  int cap_node_ = 0;
  int cap_edge_ = 0;
  std::vector<int> z_of_type_;
  static int symbol_to_z(const char* sym);
};

}  // namespace LAMMPS_NS

#endif
#endif
