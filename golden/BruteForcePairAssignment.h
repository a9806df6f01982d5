/* Exact brute-force 1-NN PairAssignment for the golden registration
 * harness — a drop-in for FlannPairAssignment (libflann is not installed
 * in this image).  FLANN with KDTreeSingleIndex + SearchParams(-1) does
 * EXACT nearest-neighbor search over the model set with L2 distance
 * (FlannPairAssignment.cpp:50-90), so an O(S*M) scan reproduces its pair
 * semantics identically: for every masked scene point, the model index
 * with the smallest squared distance (first index on exact ties).
 *
 * This file is original harness code (golden/), not reference code.
 */
#ifndef GOLDEN_BRUTE_FORCE_PAIR_ASSIGNMENT_H
#define GOLDEN_BRUTE_FORCE_PAIR_ASSIGNMENT_H

#include "obvision/registration/icp/assign/PairAssignment.h"

namespace obvious
{

class BruteForcePairAssignment : public PairAssignment
{
public:
  BruteForcePairAssignment() : PairAssignment(2) {}

  virtual ~BruteForcePairAssignment() {}

  virtual void setModel(double** model, int size)
  {
    _model = model;
    _sizeModel = size;
  }

  using PairAssignment::determinePairs;

  virtual void determinePairs(double** scene, bool* mask, int size)
  {
    for(int i = 0; i < size; i++)
    {
      if(mask[i])
      {
        int best = 0;
        double bestD = 1e300;
        for(int m = 0; m < _sizeModel; m++)
        {
          double dx = scene[i][0] - _model[m][0];
          double dy = scene[i][1] - _model[m][1];
          double d = dx * dx + dy * dy;
          if(d < bestD)
          {
            bestD = d;
            best = m;
          }
        }
        addPair(best, i, bestD);
      }
      else
      {
        addNonPair(i);
      }
    }
  }
};

} // namespace obvious

#endif
