/* Minimal chrono-based stand-in for the reference Timer
 * (obcore/base/Timer.h) used only for debug timing in the grid sources. */
#ifndef GOLDEN_SHIM_TIMER_H
#define GOLDEN_SHIM_TIMER_H

#include <chrono>

namespace obvious
{

class Timer
{
public:
  Timer() : _start(clock::now()) {}
  void start() { _start = clock::now(); }
  double reset()
  {
    double e = elapsed();
    _start = clock::now();
    return e;
  }
  double elapsed() const
  {
    return std::chrono::duration<double>(clock::now() - _start).count();
  }

private:
  typedef std::chrono::steady_clock clock;
  clock::time_point _start;
};

} // namespace obvious

#endif
